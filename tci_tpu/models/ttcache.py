"""TT evaluator with left/right environment memoization.

Parity reference: src/cachedtensortrain.jl (TTCache :63-104, evalleft
:165-193, evalright :215-243, batch call :290-323). A TTCache is itself a
BatchEvaluator, so a TT can be re-cross-interpolated (used by global search
and by test_tensorci2's TTCache re-interpolation case).

Environments are small vectors; caching is host-side numpy dicts keyed by
index prefixes/suffixes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..parallel.batcheval import BatchEvaluator, _infer_ncent
from ..utils.util import projector_to_slice


class TTCache(BatchEvaluator):
    def __init__(self, sitetensors_or_tt, sitedims: Optional[Sequence] = None):
        if hasattr(sitetensors_or_tt, "sitetensors"):
            tensors = sitetensors_or_tt.sitetensors()
            if sitedims is None:
                sitedims = sitetensors_or_tt.sitedims()
        else:
            tensors = list(sitetensors_or_tt)
            if sitedims is None:
                sitedims = [list(t.shape[1:-1]) for t in tensors]
        if len(tensors) != len(sitedims):
            raise ValueError(
                "The number of site tensors and site dimensions must match."
            )
        for n, t in enumerate(tensors):
            if int(np.prod(sitedims[n])) != int(np.prod(t.shape[1:-1])):
                raise ValueError(
                    f"Site dimensions do not match the site tensor at {n}."
                )
        self.sitetensors: List[np.ndarray] = [
            np.asarray(t).reshape(t.shape[0], -1, t.shape[-1]) for t in tensors
        ]
        self._sitedims = [list(d) for d in sitedims]
        self.cacheleft: List[Dict[Tuple, np.ndarray]] = [
            {} for _ in self.sitetensors
        ]
        self.cacheright: List[Dict[Tuple, np.ndarray]] = [
            {} for _ in self.sitetensors
        ]

    def sitedims(self) -> List[List[int]]:
        return self._sitedims

    def __len__(self) -> int:
        return len(self.sitetensors)

    def evalleft(self, indexset) -> np.ndarray:
        k = len(indexset)
        if k == 0:
            return np.ones(1, dtype=self.sitetensors[0].dtype)
        key = tuple(indexset)
        cache = self.cacheleft[k - 1]
        hit = cache.get(key)
        if hit is not None:
            return hit
        leftenv = self.evalleft(key[:-1])
        localtensor = self.sitetensors[k - 1][:, key[-1], :]
        result = leftenv @ localtensor
        cache[key] = result
        return result

    def evalright(self, indexset) -> np.ndarray:
        L = len(self)
        if len(indexset) == 0:
            return np.ones(1, dtype=self.sitetensors[0].dtype)
        k = L - len(indexset)  # 0-based position of first involved tensor
        key = tuple(indexset)
        cache = self.cacheright[k]
        hit = cache.get(key)
        if hit is not None:
            return hit
        rightenv = self.evalright(key[1:])
        localtensor = self.sitetensors[k][:, key[0], :]
        result = localtensor @ rightenv
        cache[key] = result
        return result

    def evaluate(self, indexset, usecache: bool = True):
        if len(indexset) != len(self):
            raise ValueError("Index length mismatch.")
        if len(indexset) and isinstance(indexset[0], (list, tuple)):
            # multi-leg indices: fuse in C order per site
            indexset = [
                int(np.ravel_multi_index(tuple(mi), tuple(self._sitedims[l])))
                for l, mi in enumerate(indexset)
            ]
        if usecache:
            return self.evalleft(tuple(indexset))[0]
        v = None
        for T, i in zip(self.sitetensors, indexset):
            mat = T[:, i, :]
            v = mat if v is None else v @ mat
        return v[0, 0]

    def __call__(self, *args):
        if len(args) == 1:
            return self.evaluate(args[0])
        return self.batch_evaluate(*args)

    def evaluate_single(self, indexset):
        return self.evaluate(indexset)

    def batch_evaluate(self, leftindexset, rightindexset, ncent=None,
                       projector=None):
        """Batch evaluation over left x center x right products, optionally
        with a per-center-site projector (0 = free leg, v = fixed to value
        v-1; parity with the TTCache batchevaluate of the upstream suite)."""
        localdims = [int(np.prod(d)) for d in self._sitedims]
        ncent = _infer_ncent(localdims, leftindexset, rightindexset, ncent)
        L = len(self)
        nl = len(leftindexset[0]) if leftindexset else 0
        if len(leftindexset) * len(rightindexset) == 0:
            return np.zeros(
                (len(leftindexset),)
                + tuple(localdims[nl + i] for i in range(ncent))
                + (len(rightindexset),),
                dtype=self.sitetensors[0].dtype,
            )

        # left environments: (|I|, chi)
        lenv = np.stack([self.evalleft(tuple(l)) for l in leftindexset])
        # right environments: (chi, |J|)
        renv = np.stack(
            [self.evalright(tuple(r)) for r in rightindexset], axis=-1
        )

        # contract the center sites one by one: obj (|I|, d..., chi)
        obj = lenv[:, None, :]  # (|I|, 1, chi)
        returndims = []
        for pos in range(ncent):
            T = self.sitetensors[nl + pos]
            if projector is not None:
                p = projector[pos]
                # p is a per-leg projector over this site's legs (1-based,
                # 0 = free); reduce the fused site leg accordingly
                sdims = self._sitedims[nl + pos]
                T = T.reshape(T.shape[0], *sdims, T.shape[-1])
                slices, _ = projector_to_slice(p)
                T = T[(slice(None), *slices, slice(None))]
                T = T.reshape(T.shape[0], -1, T.shape[-1])
            # (B, C, chi) x (chi, d, chi') -> (B, C*d, chi')
            obj = np.einsum("bca,adr->bcdr", obj, T).reshape(
                obj.shape[0], -1, T.shape[-1]
            )
            returndims.append(T.shape[1])

        # contract with right environments: (B, C, chi) x (chi, |J|)
        res = np.einsum("bca,aj->bcj", obj, renv)
        return res.reshape(len(leftindexset), *returndims, len(rightindexset))
