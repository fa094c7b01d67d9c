"""rrLU exposed through the cross-interpolation (CI) interface.

Parity reference: src/matrixluci.jl. left/right produce the CI factors used as
TT site tensors; the pivot-inverse products are evaluated as triangular solves
(matrixluci.jl:194-241), never explicit inverses.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from scipy.linalg import solve_triangular

from .lu import rrLU, rrlu, rrlu_from_function


class MatrixLUCI:
    def __init__(
        self,
        A: Optional[np.ndarray] = None,
        *,
        lu: Optional[rrLU] = None,
        f=None,
        valuetype=None,
        matrixsize: Optional[Tuple[int, int]] = None,
        I0: Sequence[int] = (),
        J0: Sequence[int] = (),
        pivotsearch: str = "full",
        usebatcheval: bool = False,
        rng=None,
        **kwargs,
    ):
        if lu is not None:
            self.lu = lu
        elif A is not None:
            self.lu = rrlu(np.asarray(A), **kwargs)
        else:
            assert f is not None and matrixsize is not None
            self.lu = rrlu_from_function(
                valuetype, f, matrixsize, I0, J0,
                pivotsearch=pivotsearch, usebatcheval=usebatcheval, rng=rng,
                **kwargs,
            )

    @property
    def shape(self) -> Tuple[int, int]:
        return self.lu.shape

    def size(self, dim: Optional[int] = None):
        return self.lu.size(dim)

    def npivots(self) -> int:
        return self.lu.npivots()

    def rowindices(self) -> np.ndarray:
        return self.lu.rowindices()

    def colindices(self) -> np.ndarray:
        return self.lu.colindices()

    def colmatrix(self) -> np.ndarray:
        """Pivot columns A[:, J] (matrixluci.jl:161-165)."""
        n = self.npivots()
        return self.lu.left() @ self.lu.right(permute=False)[:, :n]

    def rowmatrix(self) -> np.ndarray:
        """Pivot rows A[I, :] (matrixluci.jl:175-177)."""
        n = self.npivots()
        return self.lu.left(permute=False)[:n, :] @ self.lu.right()

    def colstimespivotinv(self) -> np.ndarray:
        """C · P^{-1}: the left CI factor, with identity rows at the pivots
        (matrixluci.jl:194-213)."""
        n = self.npivots()
        m = self.size(0)
        result = np.zeros((m, n), dtype=self.lu.L.dtype)
        np.fill_diagonal(result, 1.0)
        if n < m:
            L = self.lu.left(permute=False)
            # L[n:, :] · inv(L[:n, :]) with L[:n,:] lower triangular:
            # X L1 = L2  =>  L1^T X^T = L2^T with L1^T upper triangular
            result[n:, :] = solve_triangular(
                L[:n, :].T, L[n:, :].T, lower=False
            ).T
        out = np.empty_like(result)
        out[self.lu.rowpermutation, :] = result
        return out

    def pivotinvtimesrows(self) -> np.ndarray:
        """P^{-1} · R: the right CI factor (matrixluci.jl:227-241)."""
        n = self.npivots()
        ncol = self.size(1)
        result = np.zeros((n, ncol), dtype=self.lu.U.dtype)
        np.fill_diagonal(result, 1.0)
        if n < ncol:
            U = self.lu.right(permute=False)
            result[:, n:] = solve_triangular(U[:, :n], U[:, n:], lower=False)
        out = np.empty_like(result)
        out[:, self.lu.colpermutation] = result
        return out

    def left(self) -> np.ndarray:
        if self.lu.leftorthogonal:
            return self.colstimespivotinv()
        return self.colmatrix()

    def right(self) -> np.ndarray:
        if self.lu.leftorthogonal:
            return self.rowmatrix()
        return self.pivotinvtimesrows()

    def pivoterrors(self) -> np.ndarray:
        return self.lu.pivoterrors()

    def lastpivoterror(self) -> float:
        return self.lu.lastpivoterror()
