"""Port of test/test_globalsearch.jl (0-based indices; quantics grid from
tci_tpu.utils.quantics instead of QuanticsGrids.jl)."""

import numpy as np

import tci_tpu as tci
from tci_tpu.utils.quantics import DiscretizedGrid


def test_globalsearch():
    R = 16
    grid = DiscretizedGrid(R, 0.0, 1.0)

    fx = lambda x: np.exp(-x) + 1e-3 * np.sin(1000 * x)
    f = lambda bits: fx(grid.quantics_to_origcoord(bits)[0])

    abstol = 1e-4
    localdims = [2] * R
    firstpivots = [tuple([0] * R), tuple([0] + [1] * (R - 1))]
    t, ranks, errors = tci.crossinterpolate2(
        np.float64, f, localdims, firstpivots,
        tolerance=abstol, maxbonddim=1, normalizeerror=False,
    )

    pivoterrors = tci.estimatetrueerror(
        tci.tensortrain(t), f, nsearch=30,
        rng=np.random.default_rng(1240),
    )
    errors = [e for _, e in pivoterrors]
    recomputed = [abs(f(list(p)) - t(list(p))) for p, _ in pivoterrors]
    assert np.allclose(recomputed, errors)
    # sorted descending
    assert all(errors[i] >= errors[i + 1] for i in range(len(errors) - 1))
    # the rank-1 TT leaves sizable true error; search must find it
    assert errors[0] > abstol


import pytest


@pytest.mark.slow
def test_floatingzone_batch_matches_sequential():
    """The lock-step batched floating zone reproduces the sequential
    per-start trajectories exactly (same pivots, same errors) — batching
    only changes how evaluations are dispatched."""
    from tci_tpu.models.globalsearch import _floatingzone, _floatingzone_batch
    from tci_tpu.models.tensortrain import TensorTrain
    from tci_tpu.models.ttcache import TTCache

    rng = np.random.default_rng(0)
    L, d, chi = 8, 3, 4
    cores = [
        rng.standard_normal(
            (1 if l == 0 else chi, d, 1 if l == L - 1 else chi)
        )
        for l in range(L)
    ]
    tt = TensorTrain(cores)
    f = lambda idx: float(
        np.cos(np.sum(np.asarray(idx) ** 2)) + 0.1 * np.sum(idx)
    )
    initps = [
        tuple(int(rng.integers(0, d)) for _ in range(L)) for _ in range(12)
    ]
    cache = TTCache(tt)
    for tol, nsw in [(float("inf"), 2**62), (0.5, 100)]:
        seq = [
            _floatingzone(cache, f, initp=p, earlystoptol=tol, nsweeps=nsw)
            for p in initps
        ]
        bat = _floatingzone_batch(tt, f, initps, earlystoptol=tol, nsweeps=nsw)
        for (p1, e1), (p2, e2) in zip(seq, bat):
            assert p1 == p2
            assert abs(e1 - e2) < 1e-10 * max(1.0, abs(e1))
