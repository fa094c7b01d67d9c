"""BASELINE config 2: rank-revealing LU of a 4096x4096 numerically low-rank
matrix (reference: benchmark/rrlu.jl scaled up).

The matrix is generated on-device (production TCI panels are sampled
on-device too; pushing 134 MB through the development tunnel would measure
the link, not the kernel). Timing forces full materialization of the factors
and pivot count. Reported against scipy's dense partial-pivot LU on the host
CPU (the reference pins BLAS to 1 thread; this container has 1 CPU core).
"""

import functools
import json
import time

import numpy as np


def main(N: int = 4096, rank: int = 256, tol: float = 1e-10):
    import jax
    import jax.numpy as jnp
    import scipy.linalg

    import tci_tpu as tci
    from tci_tpu.ops.lu_kernel import _rrlu_while

    key = jax.random.PRNGKey(0)

    @jax.jit
    def makeA(key):
        k1, k2 = jax.random.split(key)
        U = jax.random.normal(k1, (N, rank), dtype=jnp.float32)
        V = jax.random.normal(k2, (rank, N), dtype=jnp.float32)
        s = jnp.exp(-jnp.arange(rank, dtype=jnp.float32) / 16.0)
        return ((U * s) @ V).astype(jnp.float64)

    A = makeA(key)
    float(jnp.sum(A))  # force materialization
    args = (
        A, jnp.int32(N), jnp.int32(N), jnp.int32(rank),
        jnp.float64(tol), jnp.float64(0.0),
    )
    out = _rrlu_while(*args, leftorthogonal=True)
    int(out[3])  # warm-up + force

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _rrlu_while(*args, leftorthogonal=True)
        r = int(out[3])
        float(jnp.sum(jnp.abs(out[0])))  # force the factors
    wall = (time.perf_counter() - t0) / reps
    flops = 2.0 * r * N * N
    gflops = flops / wall / 1e9

    # accuracy: full rrlu pipeline on a 1024^2 sub-block (host-checked)
    Ah = np.asarray(A[:1024, :1024])
    lu = tci.rrlu(Ah, reltol=tol)
    err = float(np.max(np.abs(lu.left() @ lu.right() - Ah)) / np.max(np.abs(Ah)))

    t0 = time.perf_counter()
    scipy.linalg.lu(np.asarray(A))
    cpu_wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "rrlu_4096_gflops",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(cpu_wall / wall, 3),
                "detail": {
                    "npivots": int(r),
                    "wall_s": round(wall, 4),
                    "scipy_dense_lu_wall_s": round(cpu_wall, 3),
                    "rel_err_1024_subblock": err,
                },
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _common import finish, setup_cache

    setup_cache()
    main()
    finish()
