"""Device-resident zip-up MPO-MPO contraction.

TPU-native counterpart of the streaming contract+factorize zip-up
(reference: src/contraction.jl:751-788). Each bond step is ONE XLA program:
the three-tensor einsum (MXU matmuls) fused with the rank-revealing LU
truncation (ops/lu_kernel._rrlu_state) and the CI factor extraction
(ops/fused.ci_factors). Rank is data, not shape: every bond is padded to a
static per-site cap, carries a runtime rank scalar, and is masked so padded
rows/columns stay exactly zero; site tensors are unpadded on the host only
once, at the end.

Complex operands are not supported on this path (no TPU complex dtypes);
use the host zip-up or the pair kernels via TCI contraction instead.
"""

from __future__ import annotations

from functools import partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.lu_kernel import _rrlu_state
from .tensortrain import TensorTrain

_INTMAX = 2**62


@partial(jax.jit, static_argnames=("cap", "last"))
def _zip_step(R, a, b, reltol, cap: int, last: bool):
    """One zip-up bond: C = R·A[n]·B[n], then rank-revealing LU split.

    R: (P, La, Lb) with rows >= previous rank zeroed; a: (La, i, K, Ra);
    b: (Lb, K, j, Rb). Returns (site (P, i, j, cap), newR (cap, Ra, Rb),
    rank scalar); for the last site returns the unsplit core.
    """
    C = jnp.einsum("pab,aikr,bkjs->pijrs", R, a, b)
    P, i, j, Ra, Rb = C.shape
    if last:
        return C.reshape(P, i, j, Ra * Rb), None, None
    m, n = P * i * j, Ra * Rb
    Cm = C.reshape(m, n)
    maxrank = min(m, n, cap)
    A_out, rowperm, colperm, kk, _, _ = _rrlu_state(
        Cm,
        jnp.int32(m),
        jnp.int32(n),
        jnp.int32(maxrank),
        reltol,
        jnp.float64(0.0),
        False,
    )
    # Plain LU split matching the host rrlu.left()/right() convention for
    # leftorthogonal=False (L carries the pivot diagonal, U has unit
    # diagonal), so truncated device and host zip-ups carry the SAME right
    # factor bond-to-bond and stay bit-comparable.
    rmax = min(m, n)
    ridx = jnp.arange(rmax)
    keep = ridx < kk
    L_all = jnp.where(keep[None, :], jnp.tril(A_out[:, :rmax]), 0.0)
    U_all = jnp.triu(A_out[:rmax, :]).at[ridx, ridx].set(1.0)
    U_all = jnp.where(keep[:, None], U_all, 0.0)
    left = jnp.zeros_like(L_all).at[rowperm, :].set(L_all)[:, :cap]
    right = jnp.zeros_like(U_all).at[:, colperm].set(U_all)[:cap, :]
    return left.reshape(P, i, j, cap), right.reshape(cap, Ra, Rb), kk


def contract_zipup_device(
    A: TensorTrain,
    B: TensorTrain,
    tolerance: float = 1e-12,
    maxbonddim: int = _INTMAX,
) -> TensorTrain:
    """Zip-up contraction of two 4-leg tensor trains on device.

    Equivalent to the host ``contract_zipup(A, B, method="LU")``: the same
    rrLU truncation rule (reltol=tolerance, abstol=0, maxrank=maxbonddim) is
    applied at every bond, but the einsum + factorization run as one fused
    XLA program per bond with no host round trip until the final unpadding.
    """
    if len(A) != len(B):
        raise ValueError("Cannot contract tensor trains with different length.")
    dtype = np.result_type(A[0].dtype, B[0].dtype)
    if np.issubdtype(dtype, np.complexfloating):
        raise ValueError(
            "contract_zipup_device supports real dtypes only "
            "(TPU backends have no complex support); use the host zip-up."
        )
    L = len(A)
    ajs = [jnp.asarray(A[n], dtype=jnp.float64) for n in range(L)]
    bjs = [jnp.asarray(B[n], dtype=jnp.float64) for n in range(L)]
    reltol = jnp.float64(tolerance)

    sites: List = []
    kks: List = []
    R = jnp.ones((1, 1, 1), dtype=jnp.float64)
    P = 1
    for n in range(L):
        a, b = ajs[n], bjs[n]
        if n == L - 1:
            site, _, _ = _zip_step(R, a, b, reltol, cap=1, last=True)
            sites.append(site)
            break
        m = P * a.shape[1] * b.shape[2]
        nn = a.shape[3] * b.shape[3]
        cap = int(min(maxbonddim, m, nn))
        site, R, kk = _zip_step(R, a, b, reltol, cap=cap, last=False)
        sites.append(site)
        kks.append(kk)
        P = cap

    ranks = [max(1, int(k)) for k in jax.device_get(kks)]
    out: List[np.ndarray] = []
    host = jax.device_get(sites)
    for n in range(L):
        t = host[n]
        lo = 1 if n == 0 else ranks[n - 1]
        hi = 1 if n == L - 1 else ranks[n]
        out.append(np.asarray(t[:lo, :, :, :hi], dtype=dtype))
    return TensorTrain(out)
