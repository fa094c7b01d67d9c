"""Probe: compile-time levers for the giant optimize_loop program.

Config-5's cold wall is two compiles: jit(loop) ~130 s and the final
unrolled 1-site sweep ~38 s (benchmarks/audit_compiles.py, 2026-08-19).
This probe lowers the SAME loop program once (config-5 shapes: L=6, d=15,
pair mode, Imax=32, nsearch=10) and compiles it repeatedly under different
compiler_options, timing each — one process, one chip grant, no persistent
cache. Also times the unrolled vs scan 1-site sweep compile at the same
shapes (the `_get_sweep1` threshold decision).

Output: one JSON line {variant: compile_s}.
"""

import json
import time


def main():
    from _common import setup_cache  # noqa: F401  (sys.path; NO cache)
    import jax
    import jax.numpy as jnp
    import numpy as np

    # deliberately NOT setup_cache(): compiles must be real. Chip grant:
    float(jnp.sum(jnp.ones((8, 8))))

    from tci_tpu.models.device_sweep import (
        DeviceSweepEngine,
        _make_sweep1site,
        _make_sweep1site_scan,
    )

    L, d, Imax, nsearch, nch = 6, 15, 32, 10, 3
    localdims = (d,) * L
    nodes = jnp.linspace(0.0, 1.0, d)

    def fpair(idx):
        t = nodes[idx]
        s = 10.0 * jnp.sum(t)
        damp = jnp.exp(-jnp.sum((t[:, None] - t[None, :]) ** 2))
        return jnp.stack([damp * jnp.cos(s), damp * jnp.sin(s)])

    eng = DeviceSweepEngine(fpair, list(localdims), imax=Imax,
                            dtype=np.complex128, pair=True)

    # Build the loop callable exactly as optimize_loop does, then lower it
    # once at the real argument shapes and re-compile under options.
    fn = eng._get_optimize_loop(True, False, nsearch, nch, False)
    Kmax = eng.loop_kmax
    S = max(nsearch, 1)
    args = (
        jnp.zeros((L, Imax, L), jnp.int32), jnp.ones((L,), jnp.int32),
        jnp.zeros((L, Imax, L), jnp.int32), jnp.ones((L,), jnp.int32),
        jnp.zeros((L, Imax, L), jnp.int32), jnp.zeros((L,), jnp.int32),
        jnp.zeros((L, Imax, L), jnp.int32), jnp.zeros((L,), jnp.int32),
        jnp.float64(1e-14), jnp.float64(1e-7), jnp.int32(1),
        jnp.int32(2**31 - 1), jnp.int32(1),
        jnp.zeros((Kmax, S, L), jnp.int32), jnp.float64(10.0),
        jnp.float64(0.0),
        jnp.full((nch,), np.inf), jnp.full((nch,), 2**30, dtype=jnp.int32),
        jnp.zeros((nch,), bool), jnp.int32(0), jnp.int32(1),
        jnp.int32(Kmax),
    )
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_lower = time.perf_counter() - t0

    variants = {
        "default": {},
        "exec_effort_-1": {"exec_time_optimization_effort": -1.0},
        "exec_mem_-1": {"exec_time_optimization_effort": -1.0,
                        "memory_fitting_effort": -1.0},
        "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "False"},
        "no_lhs_exec_-1": {"xla_tpu_enable_latency_hiding_scheduler": "False",
                           "exec_time_optimization_effort": -1.0},
    }
    out = {"lower_s": round(t_lower, 2)}
    for name, opts in variants.items():
        try:
            t0 = time.perf_counter()
            lowered.compile(compiler_options=opts or None)
            out[name] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # noqa: BLE001
            out[name] = f"{type(e).__name__}: {str(e)[:80]}"
        print(json.dumps({name: out[name]}), flush=True)

    # 1-site sweep: unrolled vs scan compile at the same shapes
    sweep_args = (
        jnp.zeros((L, Imax, L), jnp.int32), jnp.ones((L,), jnp.int32),
        jnp.zeros((L, Imax, L), jnp.int32), jnp.ones((L,), jnp.int32),
        jnp.float64(1e-14), jnp.float64(0.0), jnp.int32(2**31 - 1),
    )
    for name, maker in (("sweep1_unrolled", _make_sweep1site),
                        ("sweep1_scan", _make_sweep1site_scan)):
        f1 = maker(fpair, localdims, Imax, True, jnp.float64, pair=True)
        t0 = time.perf_counter()
        f1.lower(*sweep_args).compile()
        out[name] = round(time.perf_counter() - t0, 1)
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    import os
    import sys
    import threading

    main()
    sys.stdout.flush()
    threading.Timer(30.0, lambda: os._exit(0)).start()
    try:
        import jax

        jax.extend.backend.clear_backends()
    except Exception:
        pass
    os._exit(0)
