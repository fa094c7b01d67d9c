"""Fused bond update (ops/fused.py) vs the generic MatrixLUCI path."""

import itertools

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu.ops.fused import FusedBondUpdater
from tci_tpu.ops.luci import MatrixLUCI
from tci_tpu.parallel.batcheval import JaxBatchEvaluator


def _fjax_lorentz(idx):
    import jax.numpy as jnp

    v = idx.astype(jnp.float64) + 1.0
    return 1.0 / (1.0 + jnp.sum(v * v))


def _fpy_lorentz(x):
    v = np.asarray(x, dtype=float) + 1.0
    return 1.0 / (1.0 + v @ v)


@pytest.mark.parametrize("leftorthogonal", [True, False])
def test_fused_matches_luci(leftorthogonal, rng):
    L = 6
    d = 3
    Ic = [tuple(rng.integers(0, d, 3)) for _ in range(7)]
    Ic = list(dict.fromkeys(Ic))
    Jc = [tuple(rng.integers(0, d, 3)) for _ in range(9)]
    Jc = list(dict.fromkeys(Jc))

    updater = FusedBondUpdater(_fjax_lorentz)
    left, right, rowind, colind, perrs, err, maxsample = updater.update(
        Ic, Jc, reltol=1e-10, abstol=0.0, maxrank=2**62,
        leftorthogonal=leftorthogonal,
    )

    Pi = np.array([[_fpy_lorentz(i + j) for j in Jc] for i in Ic])
    luci = MatrixLUCI(Pi, reltol=1e-10, abstol=0.0,
                      leftorthogonal=leftorthogonal)

    assert len(rowind) == luci.npivots()
    assert list(rowind) == list(luci.rowindices())
    assert list(colind) == list(luci.colindices())
    assert np.allclose(left, luci.left())
    assert np.allclose(right, luci.right())
    assert np.allclose(perrs, luci.pivoterrors())
    assert np.isclose(maxsample, np.max(np.abs(Pi)))
    # CI identity: left @ right reconstructs Pi at the chosen tolerance
    assert np.max(np.abs(left @ right - Pi)) < 1e-9


@pytest.mark.parametrize("leftorthogonal", [True, False])
def test_fused_truncation(leftorthogonal, rng):
    Ic = [tuple(rng.integers(0, 4, 2)) for _ in range(12)]
    Ic = list(dict.fromkeys(Ic))
    Jc = [tuple(rng.integers(0, 4, 2)) for _ in range(12)]
    Jc = list(dict.fromkeys(Jc))

    updater = FusedBondUpdater(_fjax_lorentz)
    left, right, rowind, colind, perrs, err, maxsample = updater.update(
        Ic, Jc, reltol=1e-14, abstol=0.0, maxrank=2,
        leftorthogonal=leftorthogonal,
    )
    assert len(rowind) == 2
    assert left.shape[1] == 2
    assert right.shape[0] == 2
    assert err > 0


@pytest.mark.slow
def test_full_tci_fused_equals_generic():
    """crossinterpolate2 through the fused path reproduces the plain path."""
    localdims = [4] * 5
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    assert hasattr(bf, "fused_updater")
    t1, _, e1 = tci.crossinterpolate2(np.float64, bf, localdims,
                                      tolerance=1e-10)
    t2, _, e2 = tci.crossinterpolate2(np.float64, _fpy_lorentz, localdims,
                                      tolerance=1e-10)
    assert np.allclose(
        tci.fulltensor(tci.tensortrain(t1)), tci.fulltensor(tci.tensortrain(t2))
    )
    assert bf.nevals > 0
