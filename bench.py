"""Headline benchmark: TCI2 of the 8-D Lorentzian (BASELINE.json config 1).

Runs crossinterpolate2 on f(v) = 1/(1 + v·v), v ∈ {1..10}^8, tolerance 1e-8 —
the reference README quickstart (README.md:21-29) — with function sampling
batched through the TPU-native JaxBatchEvaluator (vmap + jit on the available
accelerator; the driver runs this on the real TPU chip).

Metric: f-evaluations/second sustained over the whole optimization (sampling
is the hot loop of TCI — tensorci2.jl:848 filltensor — so this is the
throughput number the reference's design centers on). vs_baseline compares
against the reference-style scalar evaluation loop (one Python call per
sample, median of 3 in-process measurements), i.e. the single-node
throughput a Julia/Python user gets without batched evaluation.

Methodology: one full untimed warm-up optimization loads/compiles every XLA
program (the reference's benchmark scripts use BenchmarkTools.jl, whose
min/median likewise excludes Julia JIT warm-up — benchmark/rrlu.jl:8-37);
the timed run then performs every f sample, rrLU factorization and global
pivot search of a complete optimization on the chip. The cold (first-run)
wall is reported in detail.cold_wall_s for transparency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    if "--cpu-fallback" in sys.argv:
        # The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter
        # start, so the env var alone cannot force CPU — the config update
        # (before any backend init) can.
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: compile cost is one-off across runs
    # (first compile over the TPU tunnel is slow; see .claude/skills/verify).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    import tci_tpu as tci
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator

    localdims = [10] * 8

    def fjax(idx):
        v = idx.astype(jnp.float64) + 1.0
        return 1.0 / (1.0 + jnp.sum(v * v))

    def fpy(x):
        v = np.asarray(x, dtype=float) + 1.0
        return 1.0 / (1.0 + v @ v)

    # --- baseline: scalar per-call evaluation rate (reference-style loop) --
    from tci_tpu.parallel.batcheval import _batchevaluate_dispatch

    Iset = [(i % 10, (i // 10) % 10, i % 7) for i in range(40)]
    Jset = [(i % 10, i % 3, i % 5, i % 2) for i in range(50)]
    base_rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        _batchevaluate_dispatch(np.float64, fpy, localdims, Iset, Jset, 1)
        t_base = time.perf_counter() - t0
        base_rates.append(len(Iset) * 10 * len(Jset) / t_base)
    base_rate = float(np.median(base_rates))

    # --- TCI2 with batched TPU sampling -----------------------------------
    bf = JaxBatchEvaluator(fjax, localdims, dtype=np.float64)
    # warm up compile of the evaluator (excluded: compile time is one-off)
    bf.evaluate_many(np.zeros((1024, 8), dtype=np.int32))

    # The first dispatch succeeded, so the backend is alive — the init
    # watchdog has done its job; cancel it so a slow-but-healthy run
    # (cold compile cache, grant lottery) is never killed mid-measurement
    # and misreported as a tunnel outage.
    wd = globals().get("_init_wd")
    if wd is not None:
        wd.cancel()

    # Untimed warm-up optimization: loads/compiles every device program this
    # workload uses (the one-off per-process cost a serving deployment pays
    # once). The timed run below re-does ALL the real work on chip.
    tcold0 = time.perf_counter()
    tci.crossinterpolate2(np.float64, bf, localdims, tolerance=1e-8)
    cold_wall = time.perf_counter() - tcold0

    # Median of 3 timed optimizations (the reference's BenchmarkTools
    # methodology reports min/median over reps): per-dispatch latency over
    # a tunneled link is noisy at sub-second walls. Each rep's rate pairs
    # its OWN wall with its OWN sample count (rook's per-rep rng can vary
    # the count), and the headline is the median per-rep rate.
    walls = []
    nevals_reps = []
    for _ in range(3):
        nevals0 = bf.nevals
        t0 = time.perf_counter()
        tciobj, ranks, errors = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-8
        )
        walls.append(time.perf_counter() - t0)
        nevals_reps.append(bf.nevals - nevals0)
    rates = [n / w for n, w in zip(nevals_reps, walls)]
    rate = float(np.median(rates))
    wall = float(np.median(walls))
    nevals = int(np.median(nevals_reps))

    # sanity: converged and correct
    assert errors[-1] < 1e-8, f"did not converge: {errors}"
    check = abs(tciobj((1, 2, 3, 4, 5, 4, 3, 2)) - fpy((1, 2, 3, 4, 5, 4, 3, 2)))
    assert check < 1e-7, f"pointwise error {check}"

    print(
        json.dumps(
            {
                "metric": "tci2_8d_lorentzian_fevals_per_sec",
                "value": round(rate, 1),
                "unit": "evals/s",
                "vs_baseline": round(rate / base_rate, 3),
                "detail": {
                    # Honest-baseline caveat (BASELINE.md "Measured
                    # baselines"): the proxy is a Python scalar sampling
                    # loop; a compiled Julia f would be ~5-20x faster per
                    # call, so the Julia-anchored multiple is the range
                    # below, not vs_baseline.
                    "baseline_kind": "python-scalar-proxy",
                    "baseline_caveat": (
                        "proxy measures Python per-call overhead; Julia "
                        "scalar sampling is typically 5-20x this rate "
                        "(no julia binary / no egress in this image)"
                    ),
                    "est_julia_anchored_range": [
                        round(rate / (base_rate * 20.0), 2),
                        round(rate / (base_rate * 5.0), 2),
                    ],
                    "rank": int(tciobj.rank()),
                    "wall_s": round(wall, 3),
                    "wall_s_reps": [round(w, 3) for w in walls],
                    "cold_wall_s": round(cold_wall, 3),
                    "nevals": int(nevals),
                    "final_error": float(errors[-1]),
                    "baseline_scalar_evals_per_sec": round(base_rate, 1),
                    "device": str(jax.devices()[0]),
                    **(
                        {
                            "tpu_fallback": (
                                "TPU backend init wedged (tunnel outage); "
                                "measured on host CPU instead — see "
                                "docs/STATUS.md for the on-chip numbers"
                            )
                        }
                        if "--cpu-fallback" in sys.argv
                        else {}
                    ),
                },
            }
        )
    )


def _cpu_fallback_and_exit():
    """Init watchdog: the tunneled TPU backend can hang indefinitely at
    client init (observed outages of 1.5h+). Rather than letting the
    driver's bench run record nothing, rerun this script on host CPU in a
    fresh subprocess and emit its (honestly labeled) JSON line."""
    import os
    import subprocess
    import sys

    print(
        "bench.py: TPU init/run exceeded watchdog — falling back to host "
        "CPU measurement",
        file=sys.stderr,
        flush=True,
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-fallback"],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        lines = [l for l in proc.stdout.splitlines() if l.strip()]
        if proc.returncode == 0 and lines:
            print(lines[-1], flush=True)
            os._exit(0)
        err = f"rc={proc.returncode}; stderr tail: {proc.stderr[-500:]}"
    except Exception as e:  # pragma: no cover - double failure
        err = f"{type(e).__name__}: {e}"
    import json as _json

    print(
        _json.dumps(
            {
                "metric": "tci2_8d_lorentzian_fevals_per_sec",
                "value": 0.0,
                "unit": "evals/s",
                "vs_baseline": 0.0,
                "detail": {
                    "error": (
                        "TPU tunnel unavailable and CPU fallback failed: "
                        + err
                    )
                },
            }
        ),
        flush=True,
    )
    os._exit(0)


if __name__ == "__main__":
    import os
    import sys
    import threading

    if "--cpu-fallback" in sys.argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
    else:
        # Guards TPU client init + the FIRST dispatch only (grant lottery
        # alone has been observed at 650 s): main() cancels this as soon
        # as the first warm-up dispatch returns, so a slow-but-healthy
        # timed run is never killed mid-measurement.
        _init_wd = threading.Timer(1500.0, _cpu_fallback_and_exit)
        _init_wd.daemon = True
        _init_wd.start()
    main()
    sys.stdout.flush()
    # Release the TPU client gracefully (frees the tunnel's chip grant for
    # the next process), but don't let a wedged shutdown hang forever: a
    # watchdog hard-exits after 30s. The JSON line is already out.
    threading.Timer(30.0, lambda: os._exit(0)).start()
    try:
        import jax

        jax.clear_caches()
        jax.extend.backend.clear_backends()
    except Exception:
        pass
    os._exit(0)
