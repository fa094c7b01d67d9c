"""Port of test/test_cachedfunction.jl (0-based indices)."""

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu import CachedFunction, _batchevaluate_dispatch
from tci_tpu.parallel.batcheval import BatchEvaluator


class SumBatchEvaluator(BatchEvaluator):
    """BatchEvaluator test double (parity: TestFunction in the reference)."""

    def __init__(self, localdims, dtype=np.float64):
        self.localdims = localdims
        self.dtype = dtype

    def evaluate_single(self, indexset):
        return self.dtype(sum(indexset))

    def batch_evaluate(self, Iset, Jset, ncent=None):
        from tci_tpu.parallel.batcheval import (
            _assemble_indices,
            _infer_ncent,
            _result_shape,
        )

        ncent = _infer_ncent(self.localdims, Iset, Jset, ncent)
        idx = _assemble_indices(self.localdims, Iset, Jset, ncent)
        return idx.sum(axis=1).astype(self.dtype).reshape(
            _result_shape(self.localdims, Iset, Jset, ncent)
        )


@pytest.mark.parametrize("T", [np.float64, np.complex128])
def test_cache(T):
    f = lambda x: T(2 * x[0] + x[1])
    cf = CachedFunction(f, [4, 2], dtype=T)
    assert cf.f == f
    for i in range(4):
        for j in range(2):
            x = (i, j)
            assert cf(x) == f(x)
            assert cf._key(x) in cf.cache
            assert cf(x) == f(x)  # second (cached) access


@pytest.mark.parametrize("T", [np.float64, np.complex128])
def test_cache_batcheval(T):
    localdims = [2, 2, 2, 2, 2]
    leftindexset = [(0, 0)] * 10
    rightindexset = [(0, 0)] * 10
    f = CachedFunction(SumBatchEvaluator(localdims, T), localdims, dtype=T)
    assert tci.isbatchevaluable(f)
    result = _batchevaluate_dispatch(
        T, f, localdims, leftindexset, rightindexset, 1
    )
    ref = np.zeros((10, 2, 10))
    ref[:, 1, :] = 1.0
    assert np.allclose(result, ref)


def test_many_bits():
    f = lambda x: 1.0
    N = 64 * 4
    cf = CachedFunction(f, [2] * N)
    x = tuple([0] * N)
    assert cf(x) == 1.0
    assert cf._key(x) == 0
    assert cf.keytype_bits >= 256


def _tobins(i, nbit):
    """Binary digits of i (0-based value), most significant first."""
    return tuple((i >> (nbit - 1 - n)) & 1 for n in range(nbit))


def test_key_collision():
    nbit = 36
    nsample = 10**4
    cf = CachedFunction(lambda x: 1.0 + 0j, [2] * nbit, dtype=np.complex128)
    for i in range(nsample):
        x = _tobins(i, nbit)
        cf(x)
    assert cf.ncacheddata() == nsample


def test_key_boundary_check():
    L = 40
    cf = CachedFunction(lambda x: 1.0, [2] * L, dtype=np.complex128)
    with pytest.raises(ValueError):
        cf._key(tuple([0] * (2 * L)))


def test_encode_decode_cachekey():
    localdims = [2, 3, 4]
    cf = CachedFunction(
        lambda x: float(sum(x)), localdims, dtype=np.complex128
    )
    for i1 in range(2):
        for i2 in range(3):
            for i3 in range(4):
                x = (i1, i2, i3)
                cf(x)
                key = cf.encodecachekey(x)
                assert cf.decodecachekey(key) == x

    cachedata = cf.cachedata()
    for x, v in cachedata.items():
        assert cf(x) == v
    assert len(cachedata) == 24


def test_clearcache():
    cf = CachedFunction(lambda x: float(sum(x)), [3, 3])
    cf((1, 2))
    assert cf.ncacheddata() == 1
    assert cf.haskey((1, 2))
    assert (1, 2) in cf
    cf.clearcache()
    assert cf.ncacheddata() == 0


def test_cache_memory_overhead():
    """Memory-overhead bound (parity: test_cachedfunction.jl:116-133, which
    asserts the int-keyed cache stays within a small multiple of the raw data
    bytes). Python dicts carry more per-entry overhead than Julia's; the
    documented bound here is <64x raw complex128 bytes for small-int keys,
    still far below a naive tuple-keyed dict."""
    import sys

    nbit = 20
    nsample = 10**4
    cf = CachedFunction(lambda x: 1.0 + 0j, [2] * nbit, dtype=np.complex128)
    d_naive = {}
    for i in range(nsample):
        x = _tobins(i, nbit)
        d_naive[x] = cf(x)
    assert cf.ncacheddata() == nsample

    databytes = 16 * nsample
    cache_bytes = sys.getsizeof(cf.cache) + sum(
        sys.getsizeof(k) + sys.getsizeof(v) for k, v in cf.cache.items()
    )
    naive_bytes = sys.getsizeof(d_naive) + sum(
        sys.getsizeof(k) + sum(sys.getsizeof(e) for e in k) + sys.getsizeof(v)
        for k, v in d_naive.items()
    )
    assert cache_bytes / databytes < 64
    # int keys must be much cheaper than tuple keys
    assert cache_bytes < 0.25 * naive_bytes
