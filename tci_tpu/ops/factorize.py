"""Two-factor matrix splits used by TT compression and zip-up contraction.

Parity reference: src/tensortrain.jl:_factorize (:219-272). Methods: "LU"
(rank-revealing LU), "CI" (LU-backed cross interpolation), "SVD" (jnp SVD with
the reference's rel/abs truncation rule).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils.util import replacenothing
from .lu import rrlu
from .luci import MatrixLUCI

_INTMAX = 2**62


def factorize(
    A: np.ndarray,
    method: str,
    tolerance: float,
    maxbonddim: int = _INTMAX,
    leftorthogonal: bool = False,
    normalizeerror: bool = True,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Split A ≈ left · right, returning (left, right, rank)."""
    reltol, abstol = 1e-14, 0.0
    if normalizeerror:
        reltol = tolerance
    else:
        abstol = tolerance

    if method == "LU":
        fact = rrlu(
            A, abstol=abstol, reltol=reltol, maxrank=maxbonddim,
            leftorthogonal=leftorthogonal,
        )
        return fact.left(), fact.right(), fact.npivots()
    elif method == "CI":
        fact = MatrixLUCI(
            A, abstol=abstol, reltol=reltol, maxrank=maxbonddim,
            leftorthogonal=leftorthogonal,
        )
        return fact.left(), fact.right(), fact.npivots()
    elif method == "SVD":
        U, S, Vt = np.linalg.svd(np.asarray(A), full_matrices=False)
        # err[n] = sum of squared singular values dropped when keeping n+1
        tail = np.concatenate([np.cumsum((S**2)[::-1])[::-1][1:], [0.0]])
        total = float(np.sum(S**2))
        normalized = tail / total if total > 0 else tail
        first_abs = np.argmax(tail < abstol**2) if np.any(tail < abstol**2) else None
        first_rel = (
            np.argmax(normalized < reltol**2)
            if np.any(normalized < reltol**2)
            else None
        )
        trunci = min(
            replacenothing(first_abs, len(S) - 1) + 1,
            replacenothing(first_rel, len(S) - 1) + 1,
            maxbonddim,
        )
        if leftorthogonal:
            return (
                U[:, :trunci],
                S[:trunci, None] * Vt[:trunci, :],
                int(trunci),
            )
        return (
            U[:, :trunci] * S[None, :trunci],
            Vt[:trunci, :],
            int(trunci),
        )
    raise ValueError(f"Unknown factorization method {method}.")
