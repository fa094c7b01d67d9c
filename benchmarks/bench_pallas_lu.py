"""Measure the Pallas VMEM-resident rrLU against the XLA while-loop kernel.

Decision evidence for wiring vs retiring ops/pallas_lu.py: TPU Mosaic has
no f64 vector support, so the Pallas kernel can only ever serve explicitly
f32 workloads (serving-side compression of f32 tensor trains). This
benchmark compiles both kernels on hardware for f32 panels (and the XLA
kernel for f64 as context) and reports warm walls.

Usage: python bench_pallas_lu.py [--n 256] [--rank 32]

N defaults to the PALLAS_MAX_EDGE envelope (256): above it Mosaic register
allocation fails ("register allocator spill slots", measured at 512).
"""

import json
import sys
import time

import numpy as np

from _common import finish, setup_cache


def main(N: int = 256, rank: int = 32, batch: int = 32):
    setup_cache()
    import jax
    import jax.numpy as jnp

    from tci_tpu.ops.lu_kernel import _rrlu_while
    from tci_tpu.ops.pallas_lu import HAVE_PALLAS, pallas_rrlu_call

    key = jax.random.PRNGKey(0)
    U = jax.random.normal(key, (N, rank), dtype=jnp.float32)
    V = jax.random.normal(jax.random.PRNGKey(1), (rank, N), dtype=jnp.float32)
    s = jnp.exp(-jnp.arange(rank, dtype=jnp.float32) / 16.0)
    A32 = (U * s) @ V
    A64 = A32.astype(jnp.float64)
    float(jnp.sum(A32))

    out = {"N": N, "rank": rank, "have_pallas": HAVE_PALLAS}

    def timed(fn, *args, **kw):
        res = fn(*args, **kw)
        k = int(res[3])  # sync via scalar fetch
        t0 = time.perf_counter()
        res = fn(*args, **kw)
        k = int(res[3])
        return round(time.perf_counter() - t0, 4), k

    args64 = (
        A64, jnp.int32(N), jnp.int32(N), jnp.int32(rank),
        jnp.float64(1e-8), jnp.float64(0.0),
    )
    w, k = timed(_rrlu_while, *args64, leftorthogonal=True)
    out["xla_f64"] = {"wall_s": w, "npivot": k}

    args32 = (
        A32, jnp.int32(N), jnp.int32(N), jnp.int32(rank),
        jnp.float64(1e-6), jnp.float64(0.0),
    )
    w, k = timed(_rrlu_while, *args32, leftorthogonal=True)
    out["xla_f32"] = {"wall_s": w, "npivot": k}

    if HAVE_PALLAS:
        try:
            w, k = timed(
                pallas_rrlu_call, *args32, leftorthogonal=True,
                interpret=False,
            )
            out["pallas_f32"] = {"wall_s": w, "npivot": k}
        except Exception as e:  # noqa: BLE001 - record the compile failure
            out["pallas_f32"] = {"error": f"{type(e).__name__}: {e}"[:400]}

    # --- MANY-PANEL batch: the regime TCI sweeps actually produce ---------
    # One pallas_call with grid=(B,) runs B VMEM-resident eliminations
    # back-to-back (one HBM read+write per panel total, one dispatch); the
    # XLA alternative — vmap of the while-loop kernel — must stream the
    # whole (B, m, n) buffer through HBM on EVERY rank-1 step until the
    # slowest panel stops. This is where VMEM residency should beat XLA by
    # an architectural margin, not a dispatch-floor artifact.
    if HAVE_PALLAS and batch > 0:
        from tci_tpu.ops.pallas_lu import pallas_rrlu_batched

        kb = jax.random.split(jax.random.PRNGKey(2), batch)
        Ub = jax.vmap(
            lambda k: jax.random.normal(k, (N, rank), dtype=jnp.float32)
        )(kb)
        Vb = jax.vmap(
            lambda k: jax.random.normal(k, (rank, N), dtype=jnp.float32)
        )(jax.random.split(jax.random.PRNGKey(3), batch))
        Ab = jnp.einsum("bmr,brn->bmn", Ub * s[None, None, :], Vb)
        float(jnp.sum(Ab))
        ones = jnp.ones((batch,), jnp.int32)
        bargs = (
            Ab, ones * N, ones * N, ones * rank,
            jnp.full((batch,), 1e-6, jnp.float32),
            jnp.zeros((batch,), jnp.float32),
        )

        def timed_b(fn, *args, **kw):
            res = fn(*args, **kw)
            int(np.asarray(res[3])[0])  # sync via scalar fetch
            t0 = time.perf_counter()
            res = fn(*args, **kw)
            ks = np.asarray(res[3])
            return round(time.perf_counter() - t0, 4), ks

        try:
            pall_b = jax.jit(
                lambda *a: pallas_rrlu_batched(*a, leftorthogonal=True)
            )
            wp, ksp = timed_b(pall_b, *bargs)
            # XLA contender: vmapped fused while-loop elimination
            from tci_tpu.ops.lu_kernel import _rrlu_state_fused

            xla_b = jax.jit(jax.vmap(
                lambda a, m, n, r, rt, at: _rrlu_state_fused(
                    a, m, n, r, rt.astype(jnp.float64),
                    at.astype(jnp.float64), True
                )
            ))
            wx, ksx = timed_b(xla_b, *bargs)
            out["batched"] = {
                "B": batch,
                "pallas_wall_s": wp,
                "xla_vmap_wall_s": wx,
                "speedup_pallas_vs_xla": round(wx / wp, 2),
                "npivot_agree": bool((ksp == ksx).all()),
            }
        except Exception as e:  # noqa: BLE001
            out["batched"] = {"error": f"{type(e).__name__}: {e}"[:400]}

    print(
        json.dumps(
            {
                "metric": "pallas_vs_xla_rrlu",
                "value": out.get("pallas_f32", {}).get("wall_s"),
                "unit": "s (pallas f32 warm wall)",
                "vs_baseline": None,
                "detail": out,
            }
        )
    )


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 256
    r = (
        int(sys.argv[sys.argv.index("--rank") + 1])
        if "--rank" in sys.argv else 32
    )
    b = (
        int(sys.argv[sys.argv.index("--batch") + 1])
        if "--batch" in sys.argv else 32
    )
    main(n, r, b)
    finish()
