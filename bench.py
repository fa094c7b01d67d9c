"""Headline benchmark: TCI2 of the 8-D Lorentzian (BASELINE.json config 1),
plus the other four BASELINE configs embedded in the detail payload.

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

Anchors (detail.compiled_anchor): a gcc -O3 C implementation of the SAME
scalar sampling loop (benchmarks/anchor_c.py) measures the compiled
single-node ceiling on this host — a hard upper bound on what the Julia
reference could sustain — so the Julia-anchored multiple is a measurement,
not a guess. detail.rook_tier times the whole-sweep rook optimization
(3-4x fewer samples to the same tolerance) for the wall-to-tolerance view.

Methodology: one full untimed warm-up optimization loads/compiles every XLA
program (the reference's benchmark scripts use BenchmarkTools.jl, whose
min/median likewise excludes Julia JIT warm-up — benchmark/rrlu.jl:8-37);
the timed run then performs every f sample, rrLU factorization and global
pivot search of a complete optimization on the chip. The cold (first-run)
wall is reported in detail.cold_wall_s for transparency.

After config 1, the remaining BASELINE configs (2: rrLU 4096², 3: quantics
R=40, 4: 10-D GK integration, 5: complex Feynman-type) run in-process on
the same chip grant, gated by a total time budget so the headline line
always prints.

Output contract (the driver tail-captures only the last ~2KB): the FULL
detail payload is written to bench_detail.json and printed as an early
stdout line; the LAST line is one COMPACT JSON object — the config-1
headline {"metric", "value", "unit", "vs_baseline"} plus each other
config's headline quadruple under "detail", nothing bulkier.
"""

import io
import json
import os
import sys
import time

import numpy as np

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "1800"))


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _capture_json(fn, *args, **kwargs):
    """Run a bench main() capturing its stdout; return its last JSON line
    (each benchmarks/bench_*.py main prints exactly one)."""
    buf = io.StringIO()
    from contextlib import redirect_stdout

    try:
        with redirect_stdout(buf):
            fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 - report, don't kill the headline
        return {"error": f"{type(e).__name__}: {e}"}
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    for line in reversed(lines):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": "no JSON line in output"}


def _other_configs():
    """Configs 2-5 on the same chip grant, fastest first, each gated on the
    remaining time budget (a skipped config is recorded, never fatal)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    out = {}
    sections = []
    try:
        import bench_quantics
        sections.append(("config3_quantics_r40", bench_quantics.main, {},
                         240.0))
        import bench_feynman
        sections.append(("config5_feynman_complex", bench_feynman.main, {},
                         300.0))
        import bench_integration
        sections.append(
            ("config4_integration_10d_device", bench_integration.main,
             {"jax_native": True}, 300.0))
        import bench_rrlu
        sections.append(("config2_rrlu_4096", bench_rrlu.main, {}, 420.0))
    except Exception as e:  # noqa: BLE001
        out["import_error"] = f"{type(e).__name__}: {e}"
        return out
    for name, fn, kw, need in sections:
        if _remaining() < need:
            out[name] = {"skipped": f"time budget ({_remaining():.0f}s "
                                    f"left < {need:.0f}s needed)"}
            continue
        out[name] = _capture_json(fn, **kw)
    return out


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
    # Chip-grant lottery compensation: acquiring the tunneled chip has been
    # observed to take 1 s - 24 min (a per-process lottery, not workload
    # cost). Extend the section budget by the wall of ONE trivial dispatch
    # (grant wait + a microseconds-scale program) so a slow grant never
    # silently skips configs 2-5 — measured BEFORE the evaluator warm-up
    # below so that genuine cold-compile time is charged to the budget,
    # not credited back to it (an inflated budget risks an external
    # driver's hard kill landing before the final compact line prints).
    tgrant0 = time.monotonic()
    float(jnp.sum(jnp.ones((8, 8))))
    global _BUDGET_S
    _BUDGET_S += min(time.monotonic() - tgrant0, 900.0)
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

    # --- measured compiled anchor (replaces the old 5-20x Julia guess) ----
    anchor = {}
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        import anchor_c

        c_rates = anchor_c.measure()
        anchor = {
            "compiled_scalar_evals_per_sec": {
                k: round(v, 1) for k, v in c_rates.items()
            },
            "multiple_vs_compiled_inline": round(rate / c_rates["inline"], 3),
            "multiple_vs_compiled_fptr": round(rate / c_rates["fptr"], 3),
            "modeled_compiled_sampling_wall_s": round(
                nevals / c_rates["inline"], 4
            ),
            "note": (
                "gcc -O3 on this host sampling the same trivial integrand "
                "through the reference's scalar dispatch loop — a hard "
                "UPPER bound on single-node Julia throughput (real Julia "
                "pays per-sample vcat allocation + closure dispatch on "
                "top). At config-1 scale a compiled scalar sampler is "
                "faster per eval than any accelerator round trip; the "
                "batched design wins as per-sample cost or panel size "
                "grows — see rook_tier (sample count) and the other "
                "configs (integration/Feynman, where f is not free)."
            ),
        }
    except Exception as e:  # noqa: BLE001
        anchor = {"error": f"{type(e).__name__}: {e}"}

    # --- panel-sampling throughput: device vs compiled scalar -------------
    # One Π-panel protocol call f(Iset, Jset, 1) with |I|=|J|=1024, d=10
    # (10.49M samples — the exact sampling shape filltensor drives,
    # tensorci2.jl:848) for (a) the trivial config-1 Lorentzian and (b) a
    # 16-term sine-modulated variant whose per-sample cost models a physics
    # integrand. The C anchor samples the SAME formulas scalar-style, so
    # this is the measured batched-vs-compiled-scalar comparison on the hot
    # loop itself.
    panel = {}
    try:
        ks = jnp.arange(1, 17, dtype=jnp.float64)

        def fexp(idx):
            v = idx.astype(jnp.float64) + 1.0
            s = jnp.sum(v * v)
            w = jnp.sum(jnp.sin(s * ks / 16.0 + ks) / (ks + 1.0))
            return (1.0 + 0.1 * w) / (1.0 + s)

        bexp = JaxBatchEvaluator(fexp, localdims, dtype=np.float64)
        Ipanel = [(i % 10, (i // 10) % 10, i % 7) for i in range(1024)]
        Jpanel = [(i % 10, i % 3, i % 5, i % 2) for i in range(1024)]
        nsamples = len(Ipanel) * 10 * len(Jpanel)
        for name, ev in (("trivial_lorentzian", bf),
                         ("expensive_16sine", bexp)):
            ev(Ipanel, Jpanel, 1)  # warm-up compile/load
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = ev(Ipanel, Jpanel, 1)
                # fetch one scalar: block_until_ready does not synchronize
                # on the tunneled backend
                float(np.asarray(out).ravel()[0])
                reps.append(time.perf_counter() - t0)
            panel[name] = {
                "evals_per_sec": round(nsamples / float(np.median(reps)), 1),
                "wall_s": round(float(np.median(reps)), 4),
                "nsamples": nsamples,
            }
        if "compiled_scalar_evals_per_sec" in anchor:
            cs = anchor["compiled_scalar_evals_per_sec"]
            panel["multiple_vs_compiled"] = {
                "trivial_lorentzian": round(
                    panel["trivial_lorentzian"]["evals_per_sec"]
                    / cs["inline"], 2),
                "expensive_16sine": round(
                    panel["expensive_16sine"]["evals_per_sec"]
                    / cs["inline_expensive_f"], 2),
            }
    except Exception as e:  # noqa: BLE001
        panel = {"error": f"{type(e).__name__}: {e}"}

    # --- dispatch floor: what one tunnel round trip costs -----------------
    try:
        fl = []
        one = jnp.ones((8, 8))
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(one))
            fl.append(time.perf_counter() - t0)
        dispatch_floor_s = round(float(np.median(fl)), 4)
    except Exception:  # noqa: BLE001
        dispatch_floor_s = None

    # --- rook tier: wall-to-tolerance with 3-4x fewer samples -------------
    rook = {}
    if _remaining() > 300:
        try:
            rookkw = dict(tolerance=1e-8, pivotsearch="rook",
                          rng=np.random.default_rng(0))
            tci.crossinterpolate2(np.float64, bf, localdims, **rookkw)
            n0 = bf.nevals
            t0 = time.perf_counter()
            rookobj, rookranks, rookerrors = tci.crossinterpolate2(
                np.float64, bf, localdims, **rookkw
            )
            rw = time.perf_counter() - t0
            rn = bf.nevals - n0
            rook = {
                "wall_s": round(rw, 3),
                "nevals": int(rn),
                "evals_per_sec": round(rn / rw, 1),
                "final_error": float(rookerrors[-1]),
                "rank": int(rookobj.rank()),
                "sample_reduction_vs_full": round(nevals / max(rn, 1), 2),
            }
        except Exception as e:  # noqa: BLE001
            rook = {"error": f"{type(e).__name__}: {e}"}
    else:
        rook = {"skipped": "time budget"}

    # --- configs 2-5 on the same chip grant -------------------------------
    if "--config1-only" in sys.argv or "--cpu-fallback" in sys.argv:
        other = {"skipped": "--config1-only / cpu fallback"}
    else:
        other = _other_configs()

    # --- batched-vs-compiled crossover (VERDICT r4 item 3) -----------------
    # Sweep per-sample integrand cost through BOTH the C scalar anchor and
    # the device panel sampler; report where the device passes 1x and 10x
    # compiled-inline. Completes the config-1 story: free integrands favor
    # the compiled scalar loop, expensive ones the batched device panel.
    # Runs AFTER configs 2-5 (they keep budget priority); the full 5-point
    # sweep lives in benchmarks/bench_crossover.py — the in-bench sweep is
    # the live confirmation (endpoints measured first so both crossings
    # stay bracketed when the budget truncates it), and the saved dated
    # canonical sweep (bench_crossover.py --save-canonical) is embedded
    # alongside so the artifact always carries the full measured curve.
    crossover = {}
    if _remaining() > 300 and "--cpu-fallback" not in sys.argv:
        try:
            import bench_crossover

            crossover = bench_crossover.measure(
                terms=(16, 256, 1024, 4096),
                budget_s=min(240.0, _remaining()))
        except Exception as e:  # noqa: BLE001
            crossover = {"error": f"{type(e).__name__}: {e}"}
    else:
        crossover = {"skipped": "time budget / cpu fallback"}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "results",
                               "crossover_canonical.json")) as fh:
            crossover_canonical = json.load(fh)
    except Exception:  # noqa: BLE001
        crossover_canonical = None

    full = {
        "metric": "tci2_8d_lorentzian_fevals_per_sec",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / base_rate, 3),
        "detail": {
            # Baseline caveat (BASELINE.md "Measured baselines"):
            # vs_baseline compares against the Python scalar
            # sampling loop; detail.compiled_anchor holds the
            # MEASURED compiled-scalar (C, gcc -O3) ceiling that
            # upper-bounds single-node Julia.
            "baseline_kind": "python-scalar-proxy",
            "compiled_anchor": anchor,
            "panel_sampling": panel,
            "crossover_vs_compiled": crossover,
            "crossover_canonical_sweep": crossover_canonical,
            "rook_tier": rook,
            "dispatch_floor_s": dispatch_floor_s,
            "rank": int(tciobj.rank()),
            "wall_s": round(wall, 3),
            "wall_s_reps": [round(w, 3) for w in walls],
            "cold_wall_s": round(cold_wall, 3),
            "nevals": int(nevals),
            "final_error": float(errors[-1]),
            "baseline_scalar_evals_per_sec": round(base_rate, 1),
            "device": str(jax.devices()[0]),
            "other_configs": other,
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

    # FULL payload first: to disk and as an early stdout line. The driver
    # tail-captures only the last ~2KB of stdout — round 4 lost the
    # config-1 headline entirely by making the final line carry every
    # config's detail (BENCH_r04.json parsed: null).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        detail_path = None
    print(json.dumps(full), flush=True)

    def _headline(entry):
        """Compact quadruple for the final line; short marker otherwise."""
        if not isinstance(entry, dict):
            return {"error": str(entry)[:60]}
        if all(k in entry for k in ("metric", "value", "unit")):
            return {
                "metric": entry["metric"],
                "value": entry["value"],
                "unit": entry["unit"],
                "vs_baseline": entry.get("vs_baseline"),
            }
        return {
            k: str(v)[:80]
            for k, v in entry.items()
            if k in ("skipped", "error")
        } or {"error": "no headline"}

    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "vs_baseline": full["vs_baseline"],
        "detail": {
            "wall_s": round(wall, 3),
            "rank": int(tciobj.rank()),
            "nevals": int(nevals),
            "multiple_vs_compiled_anchor": anchor.get(
                "multiple_vs_compiled_inline"),
            **(
                {"crossover_1x_nterms": crossover.get("crossover_1x_nterms"),
                 "crossover_10x_nterms": crossover.get(
                     "crossover_10x_nterms")}
                if isinstance(crossover, dict) and "rows" in crossover
                else {}
            ),
            **(
                {"crossover_canonical": {
                    "1x": crossover_canonical.get("crossover_1x_nterms"),
                    "10x": crossover_canonical.get("crossover_10x_nterms"),
                    "measured": crossover_canonical.get("measured"),
                }}
                if isinstance(crossover_canonical, dict)
                and "rows" in crossover_canonical
                else {}
            ),
            **(
                {
                    name: _headline(entry)
                    for name, entry in other.items()
                }
                if isinstance(other, dict) and "skipped" not in other
                else {"other_configs": str(other)[:120]}
            ),
            "full_detail": "bench_detail.json (also printed above)",
        },
    }
    print(json.dumps(compact))


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
