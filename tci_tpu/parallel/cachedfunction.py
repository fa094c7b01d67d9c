"""Memoizing function wrapper keyed by mixed-radix integer encoding.

Parity reference: src/cachedfunction.jl plus the upstream-suite API names
(_key, cachedata, encodecachekey, decodecachekey, isbatchevaluable — see
SURVEY.md §0.1). Python ints are arbitrary precision, so the reference's
UInt32→UInt64→UInt128→UInt256 key-width ladder collapses to one code path;
`keytype` reports the equivalent width for observability/tests.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np

from .batcheval import (
    BatchEvaluator,
    _assemble_indices,
    _infer_ncent,
    _result_shape,
)


def encodecachekey(coeffs: Sequence[int], indexset) -> int:
    """Mixed-radix encoding: key = Σ_i indexset[i] * coeffs[i] (0-based)."""
    return int(sum(int(i) * int(c) for i, c in zip(indexset, coeffs)))


def decodecachekey(localdims: Sequence[int], key: int) -> tuple:
    """Inverse of encodecachekey for the given dimensions."""
    out = []
    for d in localdims:
        key, r = divmod(key, int(d))
        out.append(int(r))
    return tuple(out)


class CachedFunction(BatchEvaluator):
    def __init__(self, f: Callable, localdims: Sequence[int], dtype=np.float64):
        self.f = f
        self.localdims = list(localdims)
        self.dtype = dtype
        self.cache: Dict[int, complex] = {}
        coeffs: List[int] = [1]
        for d in self.localdims[:-1]:
            coeffs.append(coeffs[-1] * int(d))
        self.coeffs = coeffs

    # -- key machinery ----------------------------------------------------

    def _key(self, indexset) -> int:
        if len(indexset) != len(self.localdims):
            raise ValueError(
                f"Invalid indexset length {len(indexset)}; expected "
                f"{len(self.localdims)}."
            )
        return encodecachekey(self.coeffs, indexset)

    key = _key

    def encodecachekey(self, indexset) -> int:
        return self._key(indexset)

    def decodecachekey(self, key: int):
        return decodecachekey(self.localdims, key)

    @property
    def keytype_bits(self) -> int:
        """Equivalent fixed-width key size the reference would pick
        (cachedfunction.jl:121-138)."""
        log2space = sum(np.log2(d) for d in self.localdims)
        for bits in (32, 64, 128, 256, 512, 1024):
            if log2space < bits - 1:
                return bits
        return 0

    # -- cache access -----------------------------------------------------

    def cacheddata(self):
        """Raw cache dict keyed by encoded integer keys."""
        return self.cache

    def cachedata(self):
        """Cache contents keyed by decoded multi-indices (upstream-suite API,
        see SURVEY.md §0.1)."""
        return {
            decodecachekey(self.localdims, k): v for k, v in self.cache.items()
        }

    def ncacheddata(self) -> int:
        return len(self.cache)

    def cachedindices(self):
        return [decodecachekey(self.localdims, k) for k in self.cache]

    def haskey(self, indexset) -> bool:
        return self._key(indexset) in self.cache

    __contains__ = haskey

    def clearcache(self) -> None:
        self.cache.clear()

    # -- evaluation ---------------------------------------------------------

    def evaluate_single(self, indexset):
        k = self._key(indexset)
        v = self.cache.get(k)
        if v is None and k not in self.cache:
            v = self.f(tuple(int(i) for i in indexset))
            self.cache[k] = v
        return v

    def batch_evaluate(self, Iset, Jset, ncent=None):
        ncent = _infer_ncent(self.localdims, Iset, Jset, ncent)
        if len(Iset) * len(Jset) == 0:
            nl = len(Iset[0]) if Iset else 0
            return np.zeros(
                (len(Iset),)
                + tuple(self.localdims[nl + i] for i in range(ncent))
                + (len(Jset),),
                dtype=self.dtype,
            )
        indices = _assemble_indices(self.localdims, Iset, Jset, ncent)
        B = indices.shape[0]

        # per-batch dedup: compute keys vectorized, evaluate only the misses
        coeffs = np.array(self.coeffs, dtype=object)
        keys = (indices.astype(object) @ coeffs)
        vals = np.empty(B, dtype=self.dtype)
        miss_rows = []
        for r in range(B):
            v = self.cache.get(keys[r])
            if v is None and keys[r] not in self.cache:
                miss_rows.append(r)
            else:
                vals[r] = v

        if miss_rows:
            if hasattr(self.f, "evaluate_many"):
                miss_vals = self.f.evaluate_many(indices[miss_rows])
                for r, v in zip(miss_rows, miss_vals):
                    self.cache[keys[r]] = v
                    vals[r] = v
            else:
                for r in miss_rows:
                    v = self.f(tuple(int(x) for x in indices[r]))
                    self.cache[keys[r]] = v
                    vals[r] = v

        return vals.reshape(_result_shape(self.localdims, Iset, Jset, ncent))
