"""Port of test/test_cachedtensortrain.jl (0-based indices)."""

import itertools

import numpy as np

import tci_tpu as tci
from tci_tpu import TensorTrain, TTCache


def test_ttcache(rng):
    N = 4
    bonddims = [1, 2, 3, 2, 1]
    localdims = [2, 3, 3, 2]
    tt = TensorTrain(
        [rng.random((bonddims[n], localdims[n], bonddims[n + 1]))
         for n in range(N)]
    )
    ttc = TTCache(tt)

    for i in itertools.product(*[range(d) for d in localdims]):
        assert np.isclose(tt(list(i)), ttc(list(i)))

    leftindexset = [(0,)]
    rightindexset = [(0,)]

    # without projection
    ttc_batch = ttc.batch_evaluate(leftindexset, rightindexset, 2)
    assert ttc_batch.shape == (1, 3, 3, 1)
    for i in itertools.product(range(3), range(3)):
        assert np.isclose(ttc_batch[0, i[0], i[1], 0], tt([0, i[0], i[1], 0]))

    # with projection: first center site projected to index 0, second free
    ttc_proj = ttc.batch_evaluate(
        leftindexset, rightindexset, 2, projector=[[1], [0]]
    )
    ref = np.array([tt([0, 0, i, 0]) for i in range(localdims[2])])
    assert np.allclose(ttc_proj.reshape(-1), ref)


def test_ttcache_multisite(rng):
    N = 4
    bonddims = [1, 2, 3, 2, 1]
    localdims = [4, 4, 4, 4]
    sitedims = [[2, 2]] * N
    tt = TensorTrain(
        [rng.random((bonddims[n], localdims[n], bonddims[n + 1]))
         for n in range(N)]
    )
    ttc = TTCache(tt, sitedims)

    # multi-leg evaluation (fused C-order: (i, j) -> i*2 + j)
    for fused in itertools.product(*[range(4)] * N):
        multi = [(f // 2, f % 2) for f in fused]
        assert np.isclose(tt(list(fused)), ttc.evaluate(multi))

    leftindexset = [(0,)]
    rightindexset = [(0,)]
    ttc_batch = ttc.batch_evaluate(leftindexset, rightindexset, 2)
    assert ttc_batch.shape == (1, 4, 4, 1)
    for i in itertools.product(range(4), range(4)):
        assert np.isclose(ttc_batch[0, i[0], i[1], 0], tt([0, i[0], i[1], 0]))

    # projection on multi-leg sites: [[1, 1], [0, 0]] fixes site 1 legs to
    # (0, 0) and leaves site 2 free
    ttc_proj = ttc.batch_evaluate(
        leftindexset, rightindexset, 2, projector=[[1, 1], [0, 0]]
    )
    ref = np.array([tt([0, 0, i, 0]) for i in range(localdims[2])])
    assert np.allclose(ttc_proj.reshape(-1), ref)
