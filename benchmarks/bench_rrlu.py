"""BASELINE config 2: rank-revealing LU of a 4096x4096 numerically low-rank
matrix (reference: benchmark/rrlu.jl scaled up).

Reports GFLOP/s of the elimination (2·r·m·n flops for r pivots) and wall
time, compared against scipy's dense partial-pivot LU on the host CPU (the
reference pins BLAS to 1 thread; this container has 1 CPU core).
"""

import json
import time

import numpy as np


def main(N: int = 4096, rank: int = 256, tol: float = 1e-10):
    import scipy.linalg

    import tci_tpu as tci

    rng = np.random.default_rng(0)
    # numerically low-rank: exact rank + small tail
    U = rng.standard_normal((N, rank))
    V = rng.standard_normal((rank, N))
    s = np.exp(-np.arange(rank) / 16.0)
    A = (U * s) @ V

    # warm up the kernel (compile excluded)
    _ = tci.rrlu(A[:128, :128], reltol=tol)

    t0 = time.perf_counter()
    lu = tci.rrlu(A, reltol=tol)
    wall = time.perf_counter() - t0
    r = lu.npivots()
    flops = 2.0 * r * N * N
    gflops = flops / wall / 1e9

    # accuracy check on a sample block
    block = (lu.left() @ lu.right())[:256, :256]
    err = np.max(np.abs(block - A[:256, :256])) / np.max(np.abs(A))

    t0 = time.perf_counter()
    scipy.linalg.lu(A)
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
                    "wall_s": round(wall, 3),
                    "scipy_dense_lu_wall_s": round(cpu_wall, 3),
                    "rel_err_sample": float(err),
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
