"""True-error estimation by floating-zone coordinate search.

Parity reference: src/globalsearch.jl (estimatetrueerror :52-83,
_floatingzone :119-186).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .tensortrain import TensorTrain
from .ttcache import TTCache

MultiIndex = Tuple[int, ...]


def estimatetrueerror(
    tt: TensorTrain,
    f,
    nsearch: int = 100,
    initialpoints: Optional[Sequence[MultiIndex]] = None,
    rng: Optional[np.random.Generator] = None,
) -> List[Tuple[MultiIndex, float]]:
    """Floating-zone search for large-interpolation-error points; returns
    unique (pivot, error) pairs sorted by error descending."""
    if nsearch <= 0 and initialpoints is None:
        raise ValueError("No search is performed")
    if nsearch < 0:
        raise ValueError("nsearch must be non-negative")
    if rng is None:
        rng = np.random.default_rng()

    if initialpoints is None and nsearch > 0:
        dims = [d[0] for d in tt.sitedims()]
        initialpoints = [
            tuple(int(rng.integers(0, d)) for d in dims) for _ in range(nsearch)
        ]

    ttcache = TTCache(tt)
    pivoterror = [
        _floatingzone(ttcache, f, initp=initp, rng=rng)
        for initp in initialpoints
    ]
    pivoterror.sort(key=lambda pe: -pe[1])
    seen = set()
    out = []
    for p, e in pivoterror:
        if (p, e) not in seen:
            seen.add((p, e))
            out.append((p, e))
    return out


def _floatingzone(
    ttcache: TTCache,
    f,
    earlystoptol: float = float("inf"),
    nsweeps: int = 2**62,
    initp: Optional[MultiIndex] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[MultiIndex, float]:
    """Coordinate sweep maximizing |f - tt| (globalsearch.jl:119-186)."""
    from .tensorci2 import _call_f, filltensor

    if nsweeps <= 0:
        raise ValueError("nsweeps should be positive!")
    if rng is None:
        rng = np.random.default_rng()

    localdims = [d[0] for d in ttcache.sitedims()]
    n = len(ttcache)
    if initp is None:
        pivot = [int(rng.integers(0, d)) for d in localdims]
    else:
        pivot = list(initp)

    dtype = ttcache.sitetensors[0].dtype.type
    maxerror = abs(_call_f(f, pivot) - ttcache.evaluate(pivot))

    for _ in range(min(nsweeps, 10**9)):
        prev_maxerror = maxerror
        for ipos in range(n):
            exactdata = filltensor(
                dtype, f, localdims,
                [tuple(pivot[:ipos])], [tuple(pivot[ipos + 1 :])], 1,
            )
            prediction = filltensor(
                dtype, ttcache, localdims,
                [tuple(pivot[:ipos])], [tuple(pivot[ipos + 1 :])], 1,
            )
            err = np.abs(exactdata - prediction).reshape(-1)
            pivot[ipos] = int(np.argmax(err))
            maxerror = max(float(np.max(err)), maxerror)
        if maxerror == prev_maxerror or maxerror > earlystoptol:
            break

    return tuple(pivot), maxerror
