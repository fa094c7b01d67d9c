"""Adaptive cross approximation A ≈ Σ_k α_k u_k v_k^T (Kumar 2016).

Parity reference: src/matrixaca.jl. Incremental u_k/v_k update formulas
(:196-213, :249-265), auto pivot selection from the last u/v (:323-335), and
the permutation-aware setcols/setrows updates (:426-487) used by TCI1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class MatrixACA:
    def __init__(
        self,
        *,
        A: Optional[np.ndarray] = None,
        firstpivot: Optional[Tuple[int, int]] = None,
        nrows: Optional[int] = None,
        ncols: Optional[int] = None,
        dtype=np.float64,
    ):
        if A is not None and firstpivot is not None:
            A = np.asarray(A)
            i, j = firstpivot
            if A[i, j] == 0:
                raise ValueError(
                    "First ACA pivot value is exactly zero and cannot be "
                    "inverted (zero-pivot guard, cf. tensorci1.jl:182-184)."
                )
            self.rowindices = [int(i)]
            self.colindices = [int(j)]
            self.u = A[:, [j]].copy()
            self.v = A[[i], :].copy()
            self.alpha = [1 / A[i, j]]
        else:
            assert nrows is not None and ncols is not None
            self.rowindices = []
            self.colindices = []
            self.u = np.zeros((nrows, 0), dtype=dtype)
            self.v = np.zeros((0, ncols), dtype=dtype)
            self.alpha = []

    def nrows(self) -> int:
        return self.u.shape[0]

    def ncols(self) -> int:
        return self.v.shape[1]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows(), self.ncols())

    def npivots(self) -> int:
        return self.u.shape[1]

    def rank(self) -> int:
        return len(self.rowindices)

    def isempty(self) -> bool:
        return not self.colindices

    def availablerows(self):
        used = set(self.rowindices)
        return [i for i in range(self.nrows()) if i not in used]

    def availablecols(self):
        used = set(self.colindices)
        return [j for j in range(self.ncols()) if j not in used]

    # -- incremental updates (matrixaca.jl:196-283) ------------------------

    def residualcol(self, A: np.ndarray, yk: int) -> np.ndarray:
        """u_k(x) = A(x, y_k) - Σ_{l<k} [v_l(y_k)/u_l(x_l)] u_l(x), computed
        WITHOUT mutating the factorization — callers use it to vet a
        candidate pivot value before committing (an exactly-zero pivot is
        uninvertible; the reference guards zero pivots,
        tensorci1.jl:182-184)."""
        result = np.asarray(A)[:, yk].astype(self.u.dtype, copy=True) \
            if self.u.size else np.asarray(A)[:, yk].copy()
        # Recurse over committed COLUMNS (u.shape[1], not len(rowindices)):
        # the global-pivot path adds the row before the column, so the two
        # counts differ by one there.
        for l in range(self.u.shape[1]):
            xl = self.rowindices[l]
            result = result - (self.v[l, yk] / self.u[xl, l]) * self.u[:, l]
        return result

    def _uk(self, A: np.ndarray) -> np.ndarray:
        return self.residualcol(A, self.colindices[-1])

    def _vk(self, A: np.ndarray) -> np.ndarray:
        """v_k(y) = A(x_k, y) - Σ_{l<k} [u_l(x_k)/u_l(x_l)] v_l(y)."""
        k = len(self.rowindices)
        xk = self.rowindices[-1]
        result = np.asarray(A)[xk, :].copy()
        for l in range(k - 1):
            xl = self.rowindices[l]
            result = result - (self.u[xk, l] / self.u[xl, l]) * self.v[l, :]
        return result

    def addpivotcol(self, A: np.ndarray, yk: int) -> None:
        self.colindices.append(int(yk))
        self.u = np.hstack([self.u, self._uk(A)[:, None]])

    def addpivotrow(self, A: np.ndarray, xk: int) -> None:
        if self.u[xk, -1] == 0:
            raise ZeroDivisionError(
                f"ACA pivot value at row {xk} is exactly zero (residual "
                "column cancelled to working precision); refusing to invert "
                "it. Vet candidates with residualcol() before committing "
                "(zero-pivot guard, cf. tensorci1.jl:182-184)."
            )
        self.rowindices.append(int(xk))
        self.v = np.vstack([self.v, self._vk(A)[None, :]])
        self.alpha.append(1 / self.u[xk, -1])

    def addpivot(self, A: np.ndarray, pivotindices=None) -> None:
        """Add a pivot; when unspecified, pick greedily from the last u/v
        vectors (matrixaca.jl:323-335)."""
        if pivotindices is not None:
            self.addpivotcol(A, pivotindices[1])
            self.addpivotrow(A, pivotindices[0])
            return
        availcols = self.availablecols()
        yk = availcols[int(np.argmax(np.abs(self.v[-1, availcols])))]
        self.addpivotcol(A, yk)
        availrows = self.availablerows()
        xk = availrows[int(np.argmax(np.abs(self.u[availrows, -1])))]
        self.addpivotrow(A, xk)

    # -- evaluation --------------------------------------------------------

    def submatrix(self, rows=None, cols=None) -> np.ndarray:
        rows = slice(None) if rows is None else rows
        cols = slice(None) if cols is None else cols
        if self.isempty():
            nr = self.nrows() if rows == slice(None) else len(rows)
            nc = self.ncols() if cols == slice(None) else len(cols)
            return np.zeros((nr, nc), dtype=self.u.dtype)
        r = self.rank()
        alpha = np.asarray(self.alpha[:r])
        return self.u[rows, :r] @ (alpha[:, None] * self.v[:r, cols])

    def matrix(self) -> np.ndarray:
        return self.submatrix()

    def evaluate(self, i=None, j=None):
        if i is None:
            return self.submatrix()
        return np.sum(self.u[i, :] * np.asarray(self.alpha) * self.v[:, j])

    def __getitem__(self, key):
        rows, cols = key
        if isinstance(rows, (int, np.integer)) and isinstance(cols, (int, np.integer)):
            return self.evaluate(rows, cols)
        if isinstance(rows, (int, np.integer)):
            return self.submatrix([rows], cols)[0, :]
        if isinstance(cols, (int, np.integer)):
            return self.submatrix(rows, [cols])[:, 0]
        return self.submatrix(rows, cols)

    def localerror(self, a: np.ndarray, rows=None, cols=None) -> np.ndarray:
        a = np.asarray(a)
        approx = self.submatrix(rows, cols)
        rows = slice(None) if rows is None else rows
        cols = slice(None) if cols is None else cols
        return np.abs(a[rows][:, cols] - approx)

    def findnewpivot(self, a: np.ndarray, rowindices=None, colindices=None):
        from .lu_kernel import submatrixargmax_colmajor

        a = np.asarray(a)
        if rowindices is None:
            rowindices = self.availablerows()
        if colindices is None:
            colindices = self.availablecols()
        if self.rank() == min(a.shape):
            raise ValueError(
                "Cannot find a new pivot: already full rank."
            )
        if len(rowindices) == 0 or len(colindices) == 0:
            raise ValueError("Cannot find a new pivot in an empty row/col set")
        localerrors = self.localerror(a, rowindices, colindices)
        r, c = submatrixargmax_colmajor(localerrors)
        return (rowindices[r], colindices[c]), localerrors[r, c]

    # -- permutation-aware updates (matrixaca.jl:426-487) -------------------

    def setcols(self, newpivotrows: np.ndarray, permutation) -> None:
        """Update v after the column set was permuted/extended; permutation[j]
        is the new position of old column j."""
        permutation = np.asarray(permutation)
        self.colindices = [int(permutation[j]) for j in self.colindices]
        tempv = np.empty(newpivotrows.shape, dtype=self.v.dtype)
        tempv[:, permutation] = self.v
        self.v = tempv
        newindices = np.setdiff1d(
            np.arange(newpivotrows.shape[1]), permutation
        )
        for k in range(newpivotrows.shape[0]):
            self.v[k, newindices] = newpivotrows[k, newindices]
            for l in range(k):
                self.v[k, newindices] -= self.v[l, newindices] * (
                    self.u[self.rowindices[k], l] * self.alpha[l]
                )

    def setrows(self, newpivotcols: np.ndarray, permutation) -> None:
        """Update u after the row set was permuted/extended."""
        permutation = np.asarray(permutation)
        self.rowindices = [int(permutation[i]) for i in self.rowindices]
        tempu = np.empty(newpivotcols.shape, dtype=self.u.dtype)
        tempu[permutation, :] = self.u
        self.u = tempu
        newindices = np.setdiff1d(
            np.arange(newpivotcols.shape[0]), permutation
        )
        for k in range(newpivotcols.shape[1]):
            self.u[newindices, k] = newpivotcols[newindices, k]
            for l in range(k):
                self.u[newindices, k] -= self.u[newindices, l] * (
                    self.v[l, self.colindices[k]] * self.alpha[l]
                )
