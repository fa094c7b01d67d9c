"""Probe: would an f32 pivot hunt pay inside the WHOLE-SWEEP rook?

The mixed-precision trick (f32 hunt + f64 completion) won config 2 at
4096x256 slabs. The whole-sweep rook's slabs are TCI panels — (Imax*dmax,
Imax) at most — and the sweep also pays panel sampling (f evals) and scan
overhead per bond. This probe times the slab elimination alone
(lu_kernel._rrlu_state, the cost the mixed hunt would cut ~5x) in f64 vs
f32 at the panel shapes of the BASELINE configs, and compares against the
measured whole-sweep wall. Decision rule: if (t_f64 - t_f32) x bonds x
slabs-per-bond is small against the sweep wall, the mixed surgery in
device_sweep does not pay; record and move on (docs/ARCHITECTURE.md).

Timing per the axon tunnel rules: warm-up pass per program, sync by
fetching a scalar.
"""

import json
import time

import numpy as np


def main():
    from _common import setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    from tci_tpu.ops.lu_kernel import _rrlu_state

    run = jax.jit(_rrlu_state, static_argnames=("leftorthogonal",))
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0]), "shapes": {}}

    # (rows, cols) = (Imax*dmax + Imax, Imax): config-1-like (d=10, Imax=16
    # converged rank 12), config-5-like (d=16, Imax=64), and a deep-chain /
    # contraction-scale panel (Imax=128, d=10)
    for (m, n) in [(176, 16), (704, 64), (1088, 64), (1408, 128)]:
        A = rng.standard_normal((m, n))
        row = {}
        for dt, tag in ((jnp.float64, "f64"), (jnp.float32, "f32")):
            Ad = jnp.asarray(A, dtype=dt)
            args = (Ad, jnp.int32(m), jnp.int32(n), jnp.int32(n),
                    jnp.asarray(1e-11, dt), jnp.asarray(0.0, dt))
            o = run(*args, leftorthogonal=True)
            float(jnp.sum(o[0]))  # warm-up + load
            reps = []
            for _ in range(5):
                t0 = time.perf_counter()
                o = run(*args, leftorthogonal=True)
                float(jnp.sum(o[0]))
                reps.append(time.perf_counter() - t0)
            row[tag] = round(float(np.median(reps)), 5)
        row["f64_minus_f32_ms"] = round(1e3 * (row["f64"] - row["f32"]), 2)
        row["speedup"] = round(row["f64"] / row["f32"], 2)
        out["shapes"][f"{m}x{n}"] = row

    print(json.dumps(out))


if __name__ == "__main__":
    main()
    import os
    import threading

    threading.Timer(30.0, lambda: os._exit(0)).start()
    try:
        import jax

        jax.extend.backend.clear_backends()
    except Exception:
        pass
    os._exit(0)
