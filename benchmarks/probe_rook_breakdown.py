"""Per-stage wall breakdown of the mixed-precision fused rook at 4096².

The config-2 north star is >=70% of the measured f64 GEMM rate at
4096²/rank-256 (BASELINE.md); the mixed rook measured 40-50% there. This
probe times each stage of the one-dispatch program SEPARATELY (each as its
own jitted program, pipelined over nrep dispatches with a single sync) so
the optimization targets the real bottleneck instead of a guess:

  alt      — the f32 slab alternation (pivot hunt) alone
  slab1    — ONE f32 (4096 x 256) slab elimination (256 sequential
             masked rank-1 steps): the hunt's unit of work
  asm      — the f64 completion (_assemble_mixed: complete-pivot block LU
             + triangular-substitution fori_loops + 2 MXU GEMMs +
             gathers/scatters)
  asm_gemm — only the two completion GEMMs + gathers (no fori_loops)
  blk      — an Rb-step GJ fori_loop on the k² block (sequential-step
             cost proxy for the completion's non-GEMM part)
  full     — the production fused program (alt + asm in one dispatch)
  gemm     — the (m x k) @ (k x n) f64 GEMM roofline, equally pipelined

Prints one JSON line with per-stage amortized walls.
"""

import json
import sys
import time

import numpy as np

from _common import finish, setup_cache


def main(N: int = 4096, rank: int = 256, nrep: int = 4):
    setup_cache()
    import jax
    import jax.numpy as jnp

    from tci_tpu.ops.lu_device import (
        _assemble_mixed_body,
        _make_rook_alternation,
        _rook_fused_cache,
        rrlu_rook_device_fused,
    )
    from tci_tpu.ops.lu_kernel import bucket

    Rb = bucket(rank)

    @jax.jit
    def makeA(key):
        k1, k2 = jax.random.split(key)
        U = jax.random.normal(k1, (N, rank), dtype=jnp.float64)
        V = jax.random.normal(k2, (rank, N), dtype=jnp.float64)
        s = jnp.exp(-jnp.arange(rank, dtype=jnp.float64) / 16.0)
        return (U * s[None, :]) @ V

    A = makeA(jax.random.PRNGKey(0))
    float(jnp.sum(A))

    def timed(fn, *args, sync=None, reps=nrep):
        """Warm-up once, then `reps` back-to-back dispatches + ONE sync
        fetch (block_until_ready does not synchronize on the tunnel)."""
        out = fn(*args)
        (sync or (lambda o: float(np.asarray(o[0]).ravel()[0])))(out)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        (sync or (lambda o: float(np.asarray(o[0]).ravel()[0])))(outs[-1])
        return (time.perf_counter() - t0) / reps

    res = {"N": N, "rank": rank, "Rb": Rb, "nrep": nrep}

    # --- production fused program (alt + asm, one dispatch) ---------------
    lu = rrlu_rook_device_fused(A, maxrank=rank, reltol=1e-10,
                                rng=np.random.default_rng(7),
                                precision="mixed")
    res["nslabs"] = lu.nslabs
    res["npivots"] = lu.npivots()
    t0 = time.perf_counter()
    lus = [rrlu_rook_device_fused(A, maxrank=rank, reltol=1e-10,
                                  rng=np.random.default_rng(7),
                                  precision="mixed", defer=True)
           for _ in range(nrep)]
    ks = [p.result().npivots() for p in lus]
    res["full_amortized_s"] = round((time.perf_counter() - t0) / nrep, 4)
    assert all(k == res["npivots"] for k in ks)

    # --- alternation alone -------------------------------------------------
    alt = jax.jit(_make_rook_alternation(N, N, Rb, 5, True))
    A32 = A.astype(jnp.float32)
    float(jnp.sum(A32))
    rng = np.random.default_rng(7)
    J0 = np.zeros((Rb,), np.int32)
    J0[:rank] = rng.choice(N, size=rank, replace=False)
    aargs = (A32, jnp.zeros((Rb,), jnp.int32), jnp.int32(0),
             jnp.asarray(J0), jnp.int32(rank), jnp.int32(rank),
             jnp.float64(1e-10), jnp.float64(0.0))
    res["alt_s"] = round(
        timed(alt, *aargs, sync=lambda o: int(np.asarray(o[3]))), 4)

    # --- one slab elimination ----------------------------------------------
    from tci_tpu.ops.lu_kernel import _rrlu_state_fused

    slab = jnp.asarray(A32[:, J0[:rank]])
    float(jnp.sum(slab))
    slab_fn = jax.jit(lambda s: _rrlu_state_fused(
        s, jnp.int32(N), jnp.int32(rank), jnp.int32(rank),
        jnp.float64(1e-10), jnp.float64(0.0), True))
    res["slab1_s"] = round(
        timed(slab_fn, slab, sync=lambda o: int(np.asarray(o[3]))), 4)

    # --- completion alone ---------------------------------------------------
    Ipad = jnp.asarray(np.asarray(lu.rowindices(), np.int32)[:Rb]) \
        if lu.npivots() >= Rb else jnp.asarray(
            np.pad(np.asarray(lu.rowindices(), np.int32),
                   (0, Rb - lu.npivots())))
    Jpad = jnp.asarray(np.asarray(lu.colindices(), np.int32)[:Rb]) \
        if lu.npivots() >= Rb else jnp.asarray(
            np.pad(np.asarray(lu.colindices(), np.int32),
                   (0, Rb - lu.npivots())))
    kf = jnp.int32(lu.npivots())
    asm = jax.jit(lambda a, i, j, k: _assemble_mixed_body(
        a, i, j, k, jnp.float64(1e-10), jnp.float64(0.0), unit_lower=True))
    res["asm_s"] = round(
        timed(asm, A, Ipad, Jpad, kf,
              sync=lambda o: int(np.asarray(o[2]))), 4)

    # --- completion GEMMs + gathers only (no fori_loops) -------------------
    @jax.jit
    def asm_gemm(a, i, j, binv):
        L = jnp.take(a, j, axis=1) @ binv
        U = binv @ jnp.take(a, i, axis=0)
        return L, U

    Binv = jnp.eye(Rb, dtype=jnp.float64)
    res["asm_gemm_s"] = round(
        timed(asm_gemm, A, Ipad, Jpad, Binv,
              sync=lambda o: float(np.asarray(o[0][0, 0]))), 4)

    # --- block fori_loops only ----------------------------------------------
    @jax.jit
    def blk_only(a, i, j, k):
        # micro-benchmark of an Rb-step Gauss-Jordan fori_loop over the
        # gathered block — the sequential-step cost scale of the
        # completion's non-GEMM part (the production completion now runs a
        # complete-pivot elimination + a substitution pass instead of GJ;
        # both are Rb-step fori_loops over Rb² data, so this is still the
        # right cost proxy)
        import jax as _jax
        B0 = jnp.take(jnp.take(a, i, axis=0), j, axis=1)
        idx = jnp.arange(Rb, dtype=jnp.int32)
        eye = jnp.eye(Rb, dtype=a.dtype)

        def gj(jj, M):
            grow = M[jj, :] / M[jj, jj]
            gcol = M[:, jj] * (idx != jj).astype(a.dtype)
            M = M - gcol[:, None] * grow[None, :]
            return jnp.where((idx == jj)[:, None], grow[None, :], M)

        M = _jax.lax.fori_loop(0, Rb, gj, jnp.concatenate([B0, eye], 1))
        return M[:, Rb:]

    res["blk_gj_s"] = round(
        timed(blk_only, A, Ipad, Jpad, kf,
              sync=lambda o: float(np.asarray(o[0, 0]))), 4)

    # --- GEMM roofline, equally pipelined -----------------------------------
    Lf = jnp.asarray(np.asarray(lu.left(), np.float64))
    Uf = jnp.asarray(np.asarray(lu.right(), np.float64))
    mm = jax.jit(lambda x, y: x @ y)
    res["gemm_s"] = round(
        timed(mm, Lf, Uf, sync=lambda o: float(np.asarray(o[0, 0]))), 4)
    res["gemm_gflops"] = round(
        2.0 * rank * N * N / res["gemm_s"] / 1e9, 1)
    res["full_effective_gflops"] = round(
        2.0 * res["npivots"] * N * N / res["full_amortized_s"] / 1e9, 1)
    res["pct_of_gemm"] = round(
        100.0 * res["full_effective_gflops"] / res["gemm_gflops"], 1)

    print(json.dumps(res))


if __name__ == "__main__":
    n = (int(sys.argv[sys.argv.index("--n") + 1])
         if "--n" in sys.argv else 4096)
    r = (int(sys.argv[sys.argv.index("--rank") + 1])
         if "--rank" in sys.argv else 256)
    main(n, r)
    finish()
