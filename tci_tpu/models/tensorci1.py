"""TCI1: Oseledets-style ACA-based tensor cross interpolation with incremental
Π-matrix updates.

Parity reference: src/tensorci1.jl. TCI1 keeps the full Π matrices in memory
and updates them incrementally as pivots are added; pivot selection uses the
ACA engine (ops/aca.py). This is the legacy algorithm — TCI2 is recommended —
kept for parity and for the TCI1<->TCI2 conversions.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.aca import MatrixACA
from ..ops.ci import AinvtimesB, AtimesBinv, MatrixCI
from ..utils.indexset import IndexSet
from ..utils.sweep import forwardsweep
from ..utils.util import maxabs
from .tensortrain import AbstractTensorTrain

MultiIndex = Tuple[int, ...]


class TensorCI1(AbstractTensorTrain):
    """TCI1 state (tensorci1.jl:67-131)."""

    def __init__(self, localdims: Sequence[int], dtype=np.float64):
        n = len(localdims)
        self.localdims = [int(d) for d in localdims]
        self.dtype = np.dtype(dtype).type
        self.Iset: List[IndexSet] = [IndexSet() for _ in range(n)]
        self.Jset: List[IndexSet] = [IndexSet() for _ in range(n)]
        self.T: List[np.ndarray] = [
            np.zeros((0, d, 0), dtype=dtype) for d in self.localdims
        ]
        self.P: List[np.ndarray] = [
            np.zeros((0, 0), dtype=dtype) for _ in range(n)
        ]
        self.aca: List[MatrixACA] = [
            MatrixACA(nrows=0, ncols=0, dtype=dtype) for _ in range(n)
        ]
        self.Pi: List[np.ndarray] = [
            np.zeros((0, 0), dtype=dtype) for _ in range(n)
        ]
        self.PiIset: List[IndexSet] = [IndexSet() for _ in range(n)]
        self.PiJset: List[IndexSet] = [IndexSet() for _ in range(n)]
        self.pivoterrors = np.full(n - 1, np.inf)
        self.maxsamplevalue = 0.0

    @classmethod
    def from_function(
        cls,
        func: Callable,
        localdims: Sequence[int],
        firstpivot: Optional[Sequence[int]] = None,
        dtype=np.float64,
    ) -> "TensorCI1":
        tci = cls(localdims, dtype=dtype)
        if firstpivot is None:
            firstpivot = tuple(0 for _ in localdims)
        firstpivot = tuple(firstpivot)
        f = lambda x: tci.dtype(func(tuple(x)))

        tci.maxsamplevalue = abs(f(firstpivot))
        if tci.maxsamplevalue == 0:
            raise ValueError("Please provide a first pivot where f(pivot) != 0.")
        if len(localdims) != len(firstpivot):
            raise ValueError("Firstpivot and localdims must have same length.")

        n = len(localdims)
        tci.Iset = [IndexSet([firstpivot[:p]]) for p in range(n)]
        tci.Jset = [IndexSet([firstpivot[p + 1 :]]) for p in range(n)]
        tci.PiIset = [tci.getPiIset(p) for p in range(n)]
        tci.PiJset = [tci.getPiJset(p) for p in range(n)]
        # pass the raw function so a batch evaluator keeps its batched entry
        # point (the dtype wrapper above is for scalar probes only; getPi
        # casts to the value type itself)
        tci.Pi = [tci.getPi(p, func) for p in range(n - 1)] + [
            np.zeros((0, 0), dtype=dtype)
        ]

        for p in range(n - 1):
            localpivot = (
                tci.PiIset[p].pos(tci.Iset[p + 1][0]),
                tci.PiJset[p + 1].pos(tci.Jset[p][0]),
            )
            tci.aca[p] = MatrixACA(A=tci.Pi[p], firstpivot=localpivot)
            if p == 0:
                tci.updateT(0, tci.Pi[p][:, [localpivot[1]]])
            tci.updateT(p + 1, tci.Pi[p][[localpivot[0]], :])
            tci.P[p] = tci.Pi[p][[localpivot[0]], :][:, [localpivot[1]]]
        tci.P[n - 1] = np.ones((1, 1), dtype=dtype)
        return tci

    # -- state ------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.T)

    def lastsweeppivoterror(self) -> float:
        return float(np.max(self.pivoterrors))

    def updatemaxsample(self, samples) -> None:
        self.maxsamplevalue = maxabs(self.maxsamplevalue, samples)

    def linkdims(self) -> List[int]:
        return [t.shape[0] for t in self.T[1:]]

    def linkdim(self, i: int) -> int:
        return self.T[i + 1].shape[0]

    def sitedims(self) -> List[List[int]]:
        return [list(t.shape[1:-1]) for t in self.T]

    def sitedim(self, i: int) -> List[int]:
        return list(self.T[i].shape[1:-1])

    def rank(self) -> int:
        ld = self.linkdims()
        return max(ld) if ld else 1

    # -- site tensors (tensorci1.jl:266-306) --------------------------------

    def TtimesPinv(self, p: int) -> np.ndarray:
        T = self.T[p]
        shape = T.shape
        TPinv = AtimesBinv(T.reshape(shape[0] * shape[1], shape[2]), self.P[p])
        return TPinv.reshape(shape)

    def PinvtimesT(self, p: int) -> np.ndarray:
        T = self.T[p]
        shape = T.shape
        PinvT = AinvtimesB(self.P[p - 1], T.reshape(shape[0], shape[1] * shape[2]))
        return PinvT.reshape(shape)

    def sitetensor(self, p: int) -> np.ndarray:
        return self.TtimesPinv(p)

    def sitetensors(self) -> List[np.ndarray]:
        return [self.sitetensor(p) for p in range(len(self.T))]

    def evaluate(self, indexset) -> complex:
        """(tensorci1.jl:373-381)"""
        v = None
        for p in range(len(self)):
            mat = AtimesBinv(self.T[p][:, indexset[p], :], self.P[p])
            v = mat if v is None else v @ mat
        return v[0, 0]

    # -- Pi matrices (tensorci1.jl:388-455) ----------------------------------

    def getPiIset(self, p: int) -> IndexSet:
        return IndexSet(
            [
                tuple(i) + (u,)
                for i in self.Iset[p].fromint
                for u in range(self.localdims[p])
            ]
        )

    def getPiJset(self, p: int) -> IndexSet:
        return IndexSet(
            [
                (u,) + tuple(j)
                for u in range(self.localdims[p])
                for j in self.Jset[p].fromint
            ]
        )

    def _rows_eval(self, f, rows: Sequence[MultiIndex]) -> np.ndarray:
        """Evaluate f at a list of full multi-indices with as few dispatches
        as possible: one batched call when f is a batch evaluator
        (evaluate_rows), a host loop otherwise. The reference samples Π
        per entry (tensorci1.jl:426-433); batching here means a
        JaxBatchEvaluator costs one device program per panel/row/column
        instead of one Python call per matrix entry."""
        from ..parallel.batcheval import evaluate_rows

        arr = np.asarray([tuple(r) for r in rows], dtype=np.int32).reshape(
            len(rows), len(self)
        )
        return evaluate_rows(f, arr, dtype=self.dtype).astype(self.dtype)

    def getPi(self, p: int, f) -> np.ndarray:
        iset = self.PiIset[p]
        jset = self.PiJset[p + 1]
        rows = [
            tuple(i) + tuple(j) for i in iset.fromint for j in jset.fromint
        ]
        res = self._rows_eval(f, rows).reshape(len(iset), len(jset))
        self.updatemaxsample(res)
        return res

    def getcross(self, p: int) -> MatrixCI:
        """(tensorci1.jl:443-455)"""
        iset = [self.PiIset[p].pos(i) for i in self.Iset[p + 1].fromint]
        jset = [self.PiJset[p + 1].pos(j) for j in self.Jset[p].fromint]
        shape = self.T[p].shape
        Tp = self.T[p].reshape(shape[0] * shape[1], shape[2])
        shape1 = self.T[p + 1].shape
        Tp1 = self.T[p + 1].reshape(shape1[0], shape1[1] * shape1[2])
        return MatrixCI(iset, jset, Tp, Tp1)

    def updateT(self, p: int, new_T: np.ndarray) -> None:
        self.T[p] = np.asarray(new_T).reshape(
            len(self.Iset[p]), self.localdims[p], len(self.Jset[p])
        )

    def updatePirows(self, p: int, f) -> None:
        """Incrementally add newly needed rows to Pi[p]
        (tensorci1.jl:496-523)."""
        newIset = self.getPiIset(p)
        oldIset = self.PiIset[p]
        diffIset = [i for i in newIset.fromint if i not in oldIset]

        newPi = np.empty((len(newIset), self.Pi[p].shape[1]), dtype=self.dtype)
        permutation = [newIset.pos(i) for i in oldIset.fromint]
        newPi[permutation, :] = self.Pi[p]
        if diffIset:
            jlist = self.PiJset[p + 1].fromint
            rows = [
                tuple(i) + tuple(j) for i in diffIset for j in jlist
            ]
            block = self._rows_eval(f, rows).reshape(len(diffIset), len(jlist))
            for r, imulti in enumerate(diffIset):
                newPi[newIset.pos(imulti), :] = block[r]
            self.updatemaxsample(block)
        self.Pi[p] = newPi
        self.PiIset[p] = newIset

        Tshape = self.T[p].shape
        Tp = self.T[p].reshape(Tshape[0] * Tshape[1], Tshape[2])
        self.aca[p].setrows(Tp, permutation)

    def updatePicols(self, p: int, f) -> None:
        """(tensorci1.jl:533-555)"""
        newJset = self.getPiJset(p + 1)
        oldJset = self.PiJset[p + 1]
        diffJset = [j for j in newJset.fromint if j not in oldJset]

        newPi = np.empty((self.Pi[p].shape[0], len(newJset)), dtype=self.dtype)
        permutation = [newJset.pos(j) for j in oldJset.fromint]
        newPi[:, permutation] = self.Pi[p]
        if diffJset:
            ilist = self.PiIset[p].fromint
            rows = [
                tuple(i) + tuple(j) for j in diffJset for i in ilist
            ]
            block = self._rows_eval(f, rows).reshape(len(diffJset), len(ilist))
            for c, jmulti in enumerate(diffJset):
                newPi[:, newJset.pos(jmulti)] = block[c]
            self.updatemaxsample(block)
        self.Pi[p] = newPi
        self.PiJset[p + 1] = newJset

        Tshape = self.T[p + 1].shape
        Tp = self.T[p + 1].reshape(Tshape[0], Tshape[1] * Tshape[2])
        self.aca[p].setcols(Tp, permutation)

    # -- pivot insertion (tensorci1.jl:573-653) -------------------------------

    def addpivotrow(self, cross: MatrixCI, p: int, newi: int, f) -> None:
        self.aca[p].addpivotrow(self.Pi[p], newi)
        cross.addpivotrow(self.Pi[p], newi)
        self.Iset[p + 1].push(self.PiIset[p][newi])
        self.updateT(p + 1, cross.pivotrows)
        self.P[p] = cross.pivotmatrix()
        if p < len(self) - 2:
            self.updatePirows(p + 1, f)

    def addpivotcol(self, cross: MatrixCI, p: int, newj: int, f) -> None:
        self.aca[p].addpivotcol(self.Pi[p], newj)
        cross.addpivotcol(self.Pi[p], newj)
        self.Jset[p].push(self.PiJset[p + 1][newj])
        self.updateT(p, cross.pivotcols)
        self.P[p] = cross.pivotmatrix()
        if p > 0:
            self.updatePicols(p - 1, f)

    def addpivot(self, p: int, f, tolerance: float = 1e-12) -> None:
        """Add one pivot at bond p if its error exceeds tolerance
        (tensorci1.jl:626-653)."""
        if p < 0 or p > len(self) - 2:
            raise IndexError(
                f"Pi tensors live at bonds 0 to {len(self) - 2}."
            )
        if self.aca[p].rank() >= min(self.Pi[p].shape):
            self.pivoterrors[p] = 0.0
            return
        newpivot, newerror = self.aca[p].findnewpivot(self.Pi[p])
        self.pivoterrors[p] = newerror
        if newerror < tolerance:
            return
        # Vet the candidate's pivot value through the u-recursion BEFORE
        # mutating any state: the αuv-form local error above can sit just
        # over the tolerance while the recursion residual cancels to an
        # exact zero (observed at rounding level, rank ~9). A zero pivot is
        # uninvertible — treat the bond as numerically converged, the same
        # outcome the reference's zero-pivot guard enforces
        # (tensorci1.jl:182-184).
        resid = self.aca[p].residualcol(self.Pi[p], newpivot[1])
        if resid[newpivot[0]] == 0:
            self.pivoterrors[p] = 0.0
            return
        cross = self.getcross(p)
        self.addpivotcol(cross, p, newpivot[1], f)
        self.addpivotrow(cross, p, newpivot[0], f)

    # -- global pivots (tensorci1.jl:667-830) ---------------------------------

    def crosserror(self, f, x: MultiIndex, y: MultiIndex) -> float:
        x, y = tuple(x), tuple(y)
        if len(x) == 0 or len(y) == 0:
            return 0.0
        bondindex = len(x) - 1
        if x in self.Iset[bondindex + 1] or y in self.Jset[bondindex]:
            return 0.0
        if self.Jset[bondindex].isempty():
            return abs(f(x + y))
        fx = self._rows_eval(
            f, [x + tuple(j) for j in self.Jset[bondindex].fromint]
        )
        fy = self._rows_eval(
            f, [tuple(i) + y for i in self.Iset[bondindex + 1].fromint]
        )
        self.updatemaxsample(fx)
        self.updatemaxsample(fy)
        return abs(
            (AtimesBinv(fx[None, :], self.P[bondindex]) @ fy)[0] - f(x + y)
        )

    def _updateIproposal(self, f, newpivot, newI, newJ, abstol):
        """(tensorci1.jl:698-732)"""
        error = np.inf
        n = len(self)
        for bond in range(n - 1):
            if len(newI[bond + 1]) == 0:
                error = 0.0
                continue
            if error > abstol:
                newI[bond + 1] = tuple(newI[bond]) + (newpivot[bond],)
                error = self.crosserror(f, newI[bond + 1], newJ[bond])
            elif tuple(newpivot[: bond + 1]) in self.Iset[bond]:
                newI[bond + 1] = tuple(newpivot[: bond + 2])
                error = self.crosserror(f, newI[bond + 1], newJ[bond])
            else:
                xset = [
                    tuple(i) + (newpivot[bond],) for i in self.Iset[bond].fromint
                ]
                errors = [
                    self.crosserror(f, x, newJ[bond]) for x in xset
                ]
                maxindex = int(np.argmax(errors))
                newI[bond + 1] = xset[maxindex]
                error = errors[maxindex]
            if error < abstol:
                newI[bond + 1] = ()
        return newI

    def _updateJproposal(self, f, newpivot, newI, newJ, abstol):
        """(tensorci1.jl:739-773)"""
        error = np.inf
        n = len(self)
        for bond in range(n - 2, -1, -1):
            if len(newJ[bond]) == 0:
                error = 0.0
                continue
            if error > abstol:
                newJ[bond] = (newpivot[bond + 1],) + tuple(newJ[bond + 1])
                error = self.crosserror(f, newI[bond + 1], newJ[bond])
            elif tuple(newpivot[bond + 2 :]) in self.Jset[bond + 1]:
                newJ[bond] = tuple(newpivot[bond + 1 :])
                error = self.crosserror(f, newI[bond + 1], newJ[bond])
            else:
                yset = [
                    (newpivot[bond + 1],) + tuple(j)
                    for j in self.Jset[bond + 1].fromint
                ]
                errors = [self.crosserror(f, newI[bond + 1], y) for y in yset]
                maxindex = int(np.argmax(errors))
                newJ[bond] = yset[maxindex]
                error = errors[maxindex]
            if error < abstol:
                newJ[bond] = ()
        return newJ

    def addglobalpivot(self, f, newpivot: Sequence[int], abstol: float) -> None:
        """(tensorci1.jl:790-830)"""
        newpivot = tuple(newpivot)
        if len(newpivot) != len(self):
            raise ValueError(
                f"New global pivot should have exactly {len(self)} entries."
            )
        n = len(self)
        newI = [newpivot[:p] for p in range(n)]
        newJ = [newpivot[p + 1 :] for p in range(n)]
        newI = self._updateIproposal(f, newpivot, newI, newJ, abstol)

        for _ in range(n):
            newJ = self._updateJproposal(f, newpivot, newI, newJ, abstol)
            newI = self._updateIproposal(f, newpivot, newI, newJ, abstol)
            if [len(i) == 0 for i in newI[1:]] == [
                len(j) == 0 for j in newJ[: n - 1]
            ]:
                break

        for p in range(n - 1):
            if len(newI[p + 1]) != 0:
                self.addpivotrow(
                    self.getcross(p), p, self.PiIset[p].pos(newI[p + 1]), f
                )
        for p in range(n - 2, -1, -1):
            if len(newJ[p]) != 0:
                self.addpivotcol(
                    self.getcross(p), p, self.PiJset[p + 1].pos(newJ[p]), f
                )


def crossinterpolate1(
    valuetype,
    f,
    localdims: Sequence[int],
    firstpivot: Optional[Sequence[int]] = None,
    tolerance: float = 1e-8,
    maxiter: int = 200,
    sweepstrategy: str = "backandforth",
    pivottolerance: float = 1e-12,
    verbosity: int = 0,
    additionalpivots: Sequence[Sequence[int]] = (),
    normalizeerror: bool = True,
):
    """Cross-interpolate f by TCI1 (tensorci1.jl:894-952).

    Returns (tci, ranks, errors)."""
    tci = TensorCI1.from_function(f, localdims, firstpivot, dtype=valuetype)
    n = len(tci)
    errors: List[float] = []
    ranks: List[int] = []

    for pivot in additionalpivots:
        tci.addglobalpivot(f, pivot, tolerance)

    for it in range(tci.rank() + 1, maxiter + 1):
        if forwardsweep(sweepstrategy, it):
            for bond in range(n - 1):
                tci.addpivot(bond, f, pivottolerance)
        else:
            for bond in range(n - 2, -1, -1):
                tci.addpivot(bond, f, pivottolerance)

        errornormalization = tci.maxsamplevalue if normalizeerror else 1.0
        errors.append(tci.lastsweeppivoterror())
        ranks.append(tci.rank())
        if verbosity > 0 and it % 10 == 0:
            print(
                f"iteration = {it}, rank = {ranks[-1]}, error= {errors[-1]}"
            )
        if errors[-1] < tolerance * errornormalization:
            break

    errornormalization = tci.maxsamplevalue if normalizeerror else 1.0
    return tci, ranks, [e / errornormalization for e in errors]


def crossinterpolate(*args, **kwargs):
    """Deprecated alias for crossinterpolate1 (tensorci1.jl:961-969)."""
    import warnings

    warnings.warn(
        "crossinterpolate is deprecated; use crossinterpolate1.",
        DeprecationWarning,
    )
    return crossinterpolate1(*args, **kwargs)
