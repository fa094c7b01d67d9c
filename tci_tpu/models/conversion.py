"""Conversions between TCI1, TCI2, TensorTrain and matrix factorizations.

Parity reference: src/conversion.jl.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..ops.aca import MatrixACA
from ..ops.lu import rrLU
from ..ops.luci import MatrixLUCI
from ..utils.indexset import IndexSet
from .tensorci1 import TensorCI1
from .tensorci2 import TensorCI2, kronecker_is, kronecker_sj
from .tensortrain import TensorTrain

MultiIndex = Tuple[int, ...]

_INTMAX = 2**62


def aca_from_rrlu(lu: rrLU) -> MatrixACA:
    """Convert an rrLU factorization into ACA form (conversion.jl:45-74)."""
    aca = MatrixACA(nrows=lu.shape[0], ncols=lu.shape[1], dtype=lu.L.dtype)
    aca.rowindices = [int(i) for i in lu.rowindices()]
    aca.colindices = [int(j) for j in lu.colindices()]
    aca.u = lu.left().copy()
    aca.v = lu.right().copy()
    d = lu.diag()
    aca.alpha = list(1.0 / d)
    if lu.leftorthogonal:
        for j in range(aca.u.shape[1]):
            aca.u[:, j] *= d[j]
    else:
        for i in range(aca.v.shape[0]):
            aca.v[i, :] *= d[i]
    return aca


def tci1_from_tci2(tci2: TensorCI2, f) -> TensorCI1:
    """Rebuild a TCI1 (with full Π matrices) from TCI2 index sets; requires f
    to re-sample Π (conversion.jl:99-155)."""
    L = len(tci2)
    tci1 = TensorCI1(tci2.localdims, dtype=tci2.dtype)
    tci1.Iset = [IndexSet(s) for s in tci2.Iset]
    tci1.Jset = [IndexSet(s) for s in tci2.Jset]
    tci1.PiIset = [tci1.getPiIset(p) for p in range(L)]
    tci1.PiJset = [tci1.getPiJset(p) for p in range(L)]
    fv = lambda x: tci1.dtype(f(tuple(x)))
    tci1.Pi = [tci1.getPi(p, fv) for p in range(L - 1)] + [
        np.zeros((0, 0), dtype=tci1.dtype)
    ]

    for ell in range(L - 1):
        iset = [tci1.PiIset[ell].pos(i) for i in tci1.Iset[ell + 1].fromint]
        jset = [tci1.PiJset[ell + 1].pos(j) for j in tci1.Jset[ell].fromint]
        tci1.updateT(ell, tci1.Pi[ell][:, jset])
        if ell == L - 2:
            tci1.updateT(L - 1, tci1.Pi[ell][iset, :])
        tci1.P[ell] = tci1.Pi[ell][np.ix_(iset, jset)]
        tci1.aca[ell] = MatrixACA(
            A=tci1.Pi[ell], firstpivot=(iset[0], jset[0])
        )
        for rowindex, colindex in zip(iset[1:], jset[1:]):
            tci1.aca[ell].addpivotcol(tci1.Pi[ell], colindex)
            tci1.aca[ell].addpivotrow(tci1.Pi[ell], rowindex)

    tci1.P[L - 1] = np.ones((1, 1), dtype=tci1.dtype)
    tci1.pivoterrors = np.asarray(tci2.bonderrors, dtype=float).copy()
    tci1.maxsamplevalue = tci2.maxsamplevalue
    return tci1


def tci2_from_tci1(tci1: TensorCI1) -> TensorCI2:
    """Convert TCI1 to TCI2 (no f needed; conversion.jl:177-200)."""
    tci2 = TensorCI2(tci1.localdims, dtype=tci1.dtype)
    tci2.Iset = [list(s.fromint) for s in tci1.Iset]
    tci2.Jset = [list(s.fromint) for s in tci1.Jset]
    L = len(tci1)
    for p in range(L - 1):
        tci2._sitetensors[p] = tci1.TtimesPinv(p)
    tci2._sitetensors[L - 1] = tci1.T[L - 1]
    tci2.pivoterrors = []
    tci2.bonderrors = np.asarray(tci1.pivoterrors, dtype=float).copy()
    tci2.maxsamplevalue = tci1.maxsamplevalue
    return tci2


def sweep1sitegetindices(
    tt: TensorTrain,
    forwardsweep: bool,
    spectatorindices: Optional[List[List[MultiIndex]]] = None,
    maxbonddim: int = _INTMAX,
    tolerance: float = 0.0,
):
    """One LUCI sweep over a raw TT, extracting pivot index sets in place
    (conversion.jl:221-308). Mutates tt into (left/right) canonical form."""
    indexset: List[List[MultiIndex]] = [[()]]
    pivoterrorsarray = np.zeros(tt.rank() + 1)

    def groupindices(T: np.ndarray, nxt: bool) -> np.ndarray:
        shape = T.shape
        if forwardsweep != nxt:
            return T.reshape(int(np.prod(shape[:-1])), shape[-1])
        return T.reshape(shape[0], int(np.prod(shape[1:])))

    def splitindices(T: np.ndarray, shape, newbonddim: int, nxt: bool):
        if forwardsweep != nxt:
            newshape = (*shape[:-1], newbonddim)
        else:
            newshape = (newbonddim, *shape[1:])
        return T.reshape(newshape)

    L = len(tt)
    tensors = tt._sitetensors
    for i in range(L - 1):
        ell = i if forwardsweep else L - 1 - i
        ellnext = i + 1 if forwardsweep else L - 2 - i
        shape = tensors[ell].shape
        shapenext = tensors[ellnext].shape

        luci = MatrixLUCI(
            groupindices(tensors[ell], False),
            leftorthogonal=forwardsweep,
            abstol=tolerance,
            maxrank=maxbonddim,
        )

        if forwardsweep:
            indexset.append(
                [
                    kronecker_is(indexset[-1], shape[1])[r]
                    for r in luci.rowindices()
                ]
            )
            if spectatorindices:
                spectatorindices[ell] = [
                    spectatorindices[ell][c] for c in luci.colindices()
                ]
        else:
            indexset.append(
                [
                    kronecker_sj(shape[1], indexset[-1])[c]
                    for c in luci.colindices()
                ]
            )
            if spectatorindices:
                spectatorindices[ell] = [
                    spectatorindices[ell][r] for r in luci.rowindices()
                ]

        tensors[ell] = splitindices(
            luci.left() if forwardsweep else luci.right(),
            shape, luci.npivots(), False,
        )
        if forwardsweep:
            nexttensor = luci.right() @ groupindices(tensors[ellnext], True)
        else:
            nexttensor = groupindices(tensors[ellnext], True) @ luci.left()
        tensors[ellnext] = splitindices(
            nexttensor, shapenext, luci.npivots(), True
        )

        perrs = luci.pivoterrors()
        npe = luci.npivots() + 1
        if npe > len(pivoterrorsarray):
            pivoterrorsarray = np.concatenate(
                [pivoterrorsarray, np.zeros(npe - len(pivoterrorsarray))]
            )
        pivoterrorsarray[:npe] = np.maximum(pivoterrorsarray[:npe], perrs[:npe])

    if forwardsweep:
        return indexset, pivoterrorsarray
    return indexset[::-1], pivoterrorsarray


def tci2_from_tensortrain(
    tt: TensorTrain,
    f=None,
    tolerance: float = 1e-12,
    maxbonddim: int = _INTMAX,
    maxiter: int = 3,
) -> TensorCI2:
    """Extract TCI2 index sets from a raw TT by alternating LUCI sweeps
    (conversion.jl:340-379). Mutates a copy of tt."""
    tt = tt.copy()
    Iset, _ = sweep1sitegetindices(
        tt, True, maxbonddim=maxbonddim, tolerance=tolerance
    )
    Jset, pivoterrors = sweep1sitegetindices(
        tt, False, maxbonddim=maxbonddim, tolerance=tolerance
    )

    for it in range(3, maxiter + 1):
        if it % 2 == 1:
            Isetnew, pivoterrors = sweep1sitegetindices(tt, True, Jset)
            if Isetnew == Iset:
                break
            Iset = Isetnew
        else:
            Jsetnew, pivoterrors = sweep1sitegetindices(tt, False, Iset)
            if Jsetnew == Jset:
                break
            Jset = Jsetnew

    tci2 = TensorCI2([d[0] for d in tt.sitedims()])
    tci2.dtype = tt[0].dtype.type
    tci2.Iset = [list(s) for s in Iset]
    tci2.Jset = [list(s) for s in Jset]
    tci2._sitetensors = list(tt.sitetensors())
    tci2.pivoterrors = list(pivoterrors)
    tci2.maxsamplevalue = max(
        float(np.max(np.abs(t))) for t in tci2._sitetensors
    )
    return tci2
