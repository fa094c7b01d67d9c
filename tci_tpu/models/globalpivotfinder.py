"""Pluggable global pivot search (parity: src/globalpivotfinder.jl).

The default finder does one coordinate-descent pass maximizing |f - tt| from
random starting points, keeping points whose error exceeds
abstol * tolmarginglobalsearch.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .tensortrain import TensorTrain

MultiIndex = Tuple[int, ...]


class GlobalPivotSearchInput:
    """State snapshot handed to global pivot finders
    (globalpivotfinder.jl:33-68)."""

    def __init__(
        self,
        localdims: Sequence[int],
        current_tt: TensorTrain,
        maxsamplevalue: float,
        Iset: Sequence[Sequence[MultiIndex]],
        Jset: Sequence[Sequence[MultiIndex]],
    ):
        self.localdims = list(localdims)
        self.current_tt = current_tt
        self.maxsamplevalue = float(maxsamplevalue)
        self.Iset = [list(s) for s in Iset]
        self.Jset = [list(s) for s in Jset]

    @classmethod
    def from_tci(cls, tci) -> "GlobalPivotSearchInput":
        return cls(
            tci.localdims,
            TensorTrain(tci.sitetensors()),
            tci.maxsamplevalue,
            tci.Iset,
            tci.Jset,
        )


class AbstractGlobalPivotFinder:
    def __call__(
        self,
        input: GlobalPivotSearchInput,
        f,
        abstol: float,
        verbosity: int = 0,
        rng: Optional[np.random.Generator] = None,
    ) -> List[MultiIndex]:
        raise NotImplementedError(
            f"find_global_pivots not implemented for {type(self)}"
        )


class DefaultGlobalPivotFinder(AbstractGlobalPivotFinder):
    """Random starts + one coordinate-descent pass maximizing |f - tt|
    (globalpivotfinder.jl:145-265)."""

    def __init__(
        self,
        nsearch: int = 5,
        maxnglobalpivot: int = 5,
        tolmarginglobalsearch: float = 10.0,
    ):
        self.nsearch = nsearch
        self.maxnglobalpivot = maxnglobalpivot
        self.tolmarginglobalsearch = tolmarginglobalsearch

    def __call__(
        self,
        input: GlobalPivotSearchInput,
        f,
        abstol: float,
        verbosity: int = 0,
        rng: Optional[np.random.Generator] = None,
    ) -> List[MultiIndex]:
        from .tensorci2 import _call_f
        from .ttcache import TTCache

        if rng is None:
            rng = np.random.default_rng()
        L = len(input.localdims)
        tt = TTCache(input.current_tt)

        initial_points = [
            tuple(int(rng.integers(0, input.localdims[p])) for p in range(L))
            for _ in range(self.nsearch)
        ]

        found: List[MultiIndex] = []
        for point in initial_points:
            current = list(point)
            best_error = 0.0
            best_point = list(point)
            for p in range(L):
                for v in range(input.localdims[p]):
                    current[p] = v
                    error = abs(
                        _call_f(f, current) - tt.evaluate(current)
                    )
                    if error > best_error:
                        best_error = error
                        best_point = list(current)
                current[p] = point[p]
            if best_error > abstol * self.tolmarginglobalsearch:
                found.append(tuple(best_point))

        if len(found) > self.maxnglobalpivot:
            found = found[: self.maxnglobalpivot]
        if verbosity > 0:
            print(f"Found {len(found)} global pivots")
        return found
