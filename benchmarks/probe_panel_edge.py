"""Root-cause probes for the whole-sweep panel-edge TPU worker crash.

Round-2 finding: whole-sweep programs kill the TPU worker when the per-bond
panel edge Imax*(dmax+1) exceeds ~2048 (observed d=15, L=10, unrolled),
while edges 1024/1536 run fine and the PER-BOND fused program at edge 2048
is also fine. The engine guards at max_panel_edge=1536
(models/device_sweep.DeviceSweepEngine).

Each probe is one process invocation (a worker crash must not take later
probes down with it); run them in sequence from the shell:

    for p in rrlu fused sweep1 sweep2 sweep-noextra; do
        python benchmarks/probe_panel_edge.py --probe $p --edge 2048
    done

Probes:
  rrlu          bare _rrlu_state elimination on an (edge x edge) panel
  fused         per-bond fused update (panel sampling + rrLU) at the edge
  sweep1        minimal whole-sweep program: ONE bond, d=15, unrolled
  sweep2        two bonds (the smallest genuinely multi-bond program)
  sweep-noextra sweep1 but without the extra-set concatenation + compaction
                (bisects the candidate-assembly constructs)

Each probe prints one JSON line {probe, edge, ok, wall_s | error}. An
internal watchdog hard-exits after --watchdog seconds so a wedged tunnel
never hangs the driver (never SIGKILL a TPU-holding process externally).
"""

import json
import sys
import threading
import time


def _emit(**kw):
    print(json.dumps(kw))
    sys.stdout.flush()


def probe_rrlu(edge: int):
    import jax
    import jax.numpy as jnp

    from tci_tpu.ops.lu_kernel import _rrlu_while

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (edge, edge), dtype=jnp.float32).astype(
        jnp.float64
    )
    args = (
        A, jnp.int32(edge), jnp.int32(edge), jnp.int32(64),
        jnp.float64(1e-10), jnp.float64(0.0),
    )
    out = _rrlu_while(*args, leftorthogonal=True)
    int(out[3])
    t0 = time.perf_counter()
    out = _rrlu_while(*args, leftorthogonal=True)
    k = int(out[3])
    return {"wall_s": round(time.perf_counter() - t0, 3), "npivot": k}


def _fjax(idx):
    import jax.numpy as jnp

    v = idx.astype(jnp.float64) + 1.0
    return 1.0 / (1.0 + jnp.sum(v * v))


def probe_fused(edge: int):
    import numpy as np

    from tci_tpu.ops.fused import FusedBondUpdater

    d = 15
    L = 10
    upd = FusedBondUpdater(_fjax, np.float64)
    rows = edge // (d + 1) * d
    Ic = [tuple(int(x) for x in np.random.default_rng(0).integers(0, d, 5))
          for _ in range(rows)]
    Jc = [tuple(int(x) for x in np.random.default_rng(1).integers(0, d, 5))
          for _ in range(rows)]
    out = upd.update(Ic, Jc, 1e-10, 0.0, 64, True, need_factors=False)
    t0 = time.perf_counter()
    out = upd.update(Ic, Jc, 1e-10, 0.0, 64, True, need_factors=False)
    return {"wall_s": round(time.perf_counter() - t0, 3),
            "npivot": len(out[2])}


def _run_sweep(edge: int, nbonds: int, with_extra: bool):
    import numpy as np

    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import _make_sweep

    d = 15
    L = nbonds + 1
    Imax = edge // (d + 1)
    localdims = (d,) * L
    sweep = _make_sweep(_fjax, localdims, Imax, True, jnp.float64)
    rng = np.random.default_rng(0)
    Iset = np.zeros((L, Imax, L), dtype=np.int32)
    Jset = np.zeros((L, Imax, L), dtype=np.int32)
    Ilen = np.zeros((L,), dtype=np.int32)
    Jlen = np.zeros((L,), dtype=np.int32)
    for b in range(L):
        n = Imax if b > 0 else 1
        Ilen[b] = n
        Iset[b, :n, :b] = rng.integers(0, d, (n, b))
        Jlen[b] = Imax if b < L - 1 else 1
        Jset[b, : Jlen[b], : L - b - 1] = rng.integers(
            0, d, (Jlen[b], L - b - 1)
        )
    eI = np.zeros((L, Imax, L), dtype=np.int32)
    eJ = np.zeros((L, Imax, L), dtype=np.int32)
    eIlen = np.zeros((L,), dtype=np.int32)
    eJlen = np.zeros((L,), dtype=np.int32)
    if with_extra:
        eIlen[:] = 4
        eJlen[:] = 4
        for b in range(L):
            eI[b, :4, :b] = rng.integers(0, d, (4, b))
            eJ[b, :4, : L - b - 1] = rng.integers(0, d, (4, L - b - 1))
    args = (
        jnp.asarray(Iset), jnp.asarray(Ilen),
        jnp.asarray(Jset), jnp.asarray(Jlen),
        jnp.asarray(eI), jnp.asarray(eIlen),
        jnp.asarray(eJ), jnp.asarray(eJlen),
        jnp.float64(1e-10), jnp.float64(0.0), jnp.int32(Imax),
    )
    out = sweep(*args)
    import jax

    res = jax.device_get(out)
    t0 = time.perf_counter()
    res = jax.device_get(sweep(*args))
    return {"wall_s": round(time.perf_counter() - t0, 3),
            "Imax": Imax, "ranks": [int(x) for x in res[1]]}


def main():
    probe = "rrlu"
    edge = 2048
    watchdog = 900
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--probe":
            probe = args[i + 1]
        elif a == "--edge":
            edge = int(args[i + 1])
        elif a == "--watchdog":
            watchdog = int(args[i + 1])

    import os

    threading.Timer(watchdog, lambda: (
        _emit(probe=probe, edge=edge, ok=False, error="watchdog timeout"),
        os._exit(3),
    )).start()

    from _common import setup_cache

    setup_cache()
    try:
        if probe == "rrlu":
            detail = probe_rrlu(edge)
        elif probe == "fused":
            detail = probe_fused(edge)
        elif probe == "sweep1":
            detail = _run_sweep(edge, 1, True)
        elif probe == "sweep2":
            detail = _run_sweep(edge, 2, True)
        elif probe == "sweep-noextra":
            detail = _run_sweep(edge, 1, False)
        else:
            raise ValueError(f"unknown probe {probe}")
        _emit(probe=probe, edge=edge, ok=True, **detail)
    except Exception as e:  # noqa: BLE001 - we want the crash signature
        _emit(probe=probe, edge=edge, ok=False,
              error=f"{type(e).__name__}: {e}"[:500])


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _common import finish

    main()
    finish()
