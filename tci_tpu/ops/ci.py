"""Matrix cross interpolation A ≈ A[:, J] · (A[I, J])^{-1} · A[I, :].

Parity reference: src/abstractmatrixci.jl and src/matrixci.jl. The
QR-stabilized products AtimesBinv/AinvtimesB (matrixci.jl:44-76) are kept
because pivot matrices can be ill-conditioned and the reference's convergence
behavior depends on this stabilization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .lu_kernel import submatrixargmax_colmajor


def AtimesBinv(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Numerically stable A · B^{-1} via a stacked thin QR (matrixci.jl:44-55)."""
    A = np.atleast_2d(np.asarray(A))
    B = np.asarray(B)
    m = A.shape[0]
    AB = np.vstack([A, B])
    Q, _ = np.linalg.qr(AB)
    QA = Q[:m, :]
    QB = Q[m:, :]
    return QA @ np.linalg.inv(QB)


def AinvtimesB(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Numerically stable A^{-1} · B (matrixci.jl:73-76)."""
    return AtimesBinv(np.asarray(B).conj().T, np.asarray(A).conj().T).conj().T


class MatrixCI:
    """Cross interpolation storing pivot rows/columns (matrixci.jl:121-160)."""

    def __init__(
        self,
        rowindices=None,
        colindices=None,
        pivotcols: Optional[np.ndarray] = None,
        pivotrows: Optional[np.ndarray] = None,
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
            self.rowindices = [int(i)]
            self.colindices = [int(j)]
            self.pivotcols = A[:, [j]].copy()
            self.pivotrows = A[[i], :].copy()
        elif pivotcols is not None:
            self.rowindices = list(rowindices)
            self.colindices = list(colindices)
            self.pivotcols = np.asarray(pivotcols)
            self.pivotrows = np.asarray(pivotrows)
        else:
            assert nrows is not None and ncols is not None
            self.rowindices = []
            self.colindices = []
            self.pivotcols = np.zeros((nrows, 0), dtype=dtype)
            self.pivotrows = np.zeros((0, ncols), dtype=dtype)

    # -- accessors -------------------------------------------------------

    def nrows(self) -> int:
        return self.pivotcols.shape[0]

    def ncols(self) -> int:
        return self.pivotrows.shape[1]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows(), self.ncols())

    def rank(self) -> int:
        return len(self.rowindices)

    def npivots(self) -> int:
        return len(self.rowindices)

    def isempty(self) -> bool:
        return not self.colindices

    def firstpivotvalue(self):
        if self.isempty():
            return 1.0
        return self.pivotcols[self.rowindices[0], 0]

    def pivotmatrix(self) -> np.ndarray:
        return self.pivotcols[self.rowindices, :]

    def leftmatrix(self) -> np.ndarray:
        return AtimesBinv(self.pivotcols, self.pivotmatrix())

    def rightmatrix(self) -> np.ndarray:
        return AinvtimesB(self.pivotmatrix(), self.pivotrows)

    def availablerows(self):
        return [i for i in range(self.nrows()) if i not in set(self.rowindices)]

    def availablecols(self):
        return [j for j in range(self.ncols()) if j not in set(self.colindices)]

    # -- evaluation ------------------------------------------------------

    def evaluate(self, i: int, j: int):
        if self.isempty():
            return self.pivotcols.dtype.type(0)
        return np.dot(self.leftmatrix()[i, :], self.pivotrows[:, j])

    def submatrix(self, rows=None, cols=None) -> np.ndarray:
        rows = slice(None) if rows is None else rows
        cols = slice(None) if cols is None else cols
        if self.isempty():
            nr = self.nrows() if rows == slice(None) else len(rows)
            nc = self.ncols() if cols == slice(None) else len(cols)
            return np.zeros((nr, nc), dtype=self.pivotcols.dtype)
        return self.leftmatrix()[rows, :] @ self.pivotrows[:, cols]

    def __getitem__(self, key):
        rows, cols = key
        if isinstance(rows, (int, np.integer)) and isinstance(cols, (int, np.integer)):
            return self.evaluate(rows, cols)
        if isinstance(rows, (int, np.integer)):
            return self.submatrix([rows], cols)[0, :]
        if isinstance(cols, (int, np.integer)):
            return self.submatrix(rows, [cols])[:, 0]
        return self.submatrix(rows, cols)

    def row(self, i: int, cols=None) -> np.ndarray:
        return self.submatrix([i], cols)[0, :]

    def col(self, j: int, rows=None) -> np.ndarray:
        return self.submatrix(rows, [j])[:, 0]

    def matrix(self) -> np.ndarray:
        return self.leftmatrix() @ self.pivotrows

    def localerror(self, a: np.ndarray, rows=None, cols=None) -> np.ndarray:
        """Elementwise |a - approx| on the selected block
        (abstractmatrixci.jl:204-213)."""
        a = np.asarray(a)
        approx = self.submatrix(rows, cols)
        rows = slice(None) if rows is None else rows
        cols = slice(None) if cols is None else cols
        return np.abs(a[rows][:, cols] - approx)

    def findnewpivot(self, a: np.ndarray, rowindices=None, colindices=None):
        """Greedy argmax of |a - approx| over available rows/cols
        (abstractmatrixci.jl:250-281)."""
        a = np.asarray(a)
        if rowindices is None:
            rowindices = self.availablerows()
        if colindices is None:
            colindices = self.availablecols()
        if self.rank() == min(a.shape):
            raise ValueError(
                "Cannot find a new pivot for this MatrixCrossInterpolation, "
                "as it is already full rank."
            )
        if len(rowindices) == 0:
            raise ValueError("Cannot find a new pivot in an empty set of rows")
        if len(colindices) == 0:
            raise ValueError("Cannot find a new pivot in an empty set of cols")
        localerrors = self.localerror(a, rowindices, colindices)
        r, c = submatrixargmax_colmajor(localerrors)
        return (rowindices[r], colindices[c]), localerrors[r, c]

    # -- pivot insertion (matrixci.jl:430-542) ----------------------------

    def addpivotrow(self, a: np.ndarray, rowindex: int) -> None:
        a = np.asarray(a)
        if a.shape != self.shape:
            raise ValueError(
                f"Matrix size mismatch: {a.shape} != {self.shape}."
            )
        if rowindex < 0 or rowindex >= self.nrows():
            raise IndexError(f"Row index {rowindex} out of bounds.")
        if rowindex in self.rowindices:
            raise ValueError(f"Cannot add row {rowindex}: it already has a pivot.")
        self.pivotrows = np.vstack([self.pivotrows, a[[rowindex], :]])
        self.rowindices.append(int(rowindex))

    def addpivotcol(self, a: np.ndarray, colindex: int) -> None:
        a = np.asarray(a)
        if a.shape != self.shape:
            raise ValueError(
                f"Matrix size mismatch: {a.shape} != {self.shape}."
            )
        if colindex < 0 or colindex >= self.ncols():
            raise IndexError(f"Col index {colindex} out of bounds.")
        if colindex in self.colindices:
            raise ValueError(f"Cannot add column {colindex}: it already has a pivot.")
        self.pivotcols = np.hstack([self.pivotcols, a[:, [colindex]]])
        self.colindices.append(int(colindex))

    def addpivot(self, a: np.ndarray, pivotindices=None) -> None:
        if pivotindices is None:
            pivotindices = self.findnewpivot(np.asarray(a))[0]
        i, j = pivotindices
        a = np.asarray(a)
        if a.shape != self.shape:
            raise ValueError(f"Matrix size mismatch: {a.shape} != {self.shape}.")
        if i < 0 or i >= self.nrows() or j < 0 or j >= self.ncols():
            raise IndexError(
                f"Pivot ({i}, {j}) out of bounds for a "
                f"{self.nrows()} x {self.ncols()} matrix."
            )
        if i in self.rowindices:
            raise ValueError(f"Row {i} already has a pivot.")
        if j in self.colindices:
            raise ValueError(f"Col {j} already has a pivot.")
        self.addpivotrow(a, i)
        self.addpivotcol(a, j)

    def isapprox(self, other: "MatrixCI") -> bool:
        return (
            self.colindices == other.colindices
            and self.rowindices == other.rowindices
            and np.allclose(self.pivotcols, other.pivotcols)
            and np.allclose(self.pivotrows, other.pivotrows)
        )


def matrix_crossinterpolate(
    a: np.ndarray,
    tolerance: float = 1e-6,
    maxiter: int = 200,
    firstpivot: Optional[Tuple[int, int]] = None,
) -> MatrixCI:
    """Greedy full-matrix cross interpolation (matrixci.jl:580-604)."""
    a = np.asarray(a)
    if firstpivot is None:
        firstpivot = submatrixargmax_colmajor(np.abs(a))
    ci = MatrixCI(A=a, firstpivot=firstpivot)
    for _ in range(maxiter):
        err = np.abs(a - ci.matrix())
        newpivot = submatrixargmax_colmajor(err)
        if err[newpivot] < tolerance:
            return ci
        ci.addpivot(a, newpivot)
    return ci
