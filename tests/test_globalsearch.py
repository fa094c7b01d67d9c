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
