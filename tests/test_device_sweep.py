"""Device-resident sweep engine (models/device_sweep.py) vs the generic path.

The engine runs whole sweeps as single XLA programs; results must match the
host-driven reference-semantics path exactly (same pivots up to tie order,
same tensors to machine precision).
"""

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu.parallel.batcheval import JaxBatchEvaluator


def _fjax_lorentz(idx):
    import jax.numpy as jnp

    v = idx.astype(jnp.float64) + 1.0
    return 1.0 / (1.0 + jnp.sum(v * v))


def _fpy_lorentz(x):
    v = np.asarray(x, dtype=float) + 1.0
    return 1.0 / (1.0 + v @ v)


def _gjax(idx):
    import jax.numpy as jnp

    v = idx.astype(jnp.float64) + 1.0
    return jnp.exp(1j * jnp.sum(v)) / (1.0 + jnp.sum(v * v))


def _gpy(x):
    v = np.asarray(x, dtype=float) + 1.0
    return np.exp(1j * np.sum(v)) / (1.0 + v @ v)


def test_device_engine_equals_generic():
    localdims = [4] * 5
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    assert hasattr(bf, "device_sweep_engine")
    t1, r1, e1 = tci.crossinterpolate2(np.float64, bf, localdims,
                                       tolerance=1e-10)
    t2, r2, e2 = tci.crossinterpolate2(np.float64, _fpy_lorentz, localdims,
                                       tolerance=1e-10)
    assert t1.linkdims() == t2.linkdims()
    assert t1.Iset == t2.Iset
    assert t1.Jset == t2.Jset
    ft1 = tci.fulltensor(tci.tensortrain(t1))
    ft2 = tci.fulltensor(tci.tensortrain(t2))
    assert np.allclose(ft1, ft2)
    assert bf.nevals > 0


def test_device_engine_complex():
    localdims = [3] * 4
    bg = JaxBatchEvaluator(_gjax, localdims, dtype=np.complex128)
    t1, _, _ = tci.crossinterpolate2(np.complex128, bg, localdims,
                                     tolerance=1e-10)
    t2, _, _ = tci.crossinterpolate2(np.complex128, _gpy, localdims,
                                     tolerance=1e-10)
    assert np.allclose(
        tci.fulltensor(tci.tensortrain(t1)), tci.fulltensor(tci.tensortrain(t2))
    )


def test_device_engine_maxbonddim():
    localdims = [6] * 4
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    t1, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                     tolerance=1e-12, maxbonddim=3)
    t2, _, _ = tci.crossinterpolate2(np.float64, _fpy_lorentz, localdims,
                                     tolerance=1e-12, maxbonddim=3)
    assert t1.rank() <= 3
    assert t1.linkdims() == t2.linkdims()


def test_device_engine_buffer_growth():
    """Start with a tiny buffer and force geometric growth."""
    from tci_tpu.models.device_sweep import DeviceSweepEngine

    localdims = [4] * 4
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    # force a tiny initial capacity
    from tci_tpu.models.device_sweep import DeviceSweepEngine as DSE

    bf._device_sweep_engine = DSE(_fjax_lorentz, localdims, imax=2)
    t1, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                     tolerance=1e-12)
    t2, _, _ = tci.crossinterpolate2(np.float64, _fpy_lorentz, localdims,
                                     tolerance=1e-12)
    assert t1.linkdims() == t2.linkdims()
    assert np.allclose(
        tci.fulltensor(tci.tensortrain(t1)), tci.fulltensor(tci.tensortrain(t2))
    )
    assert bf._device_sweep_engine.Imax > 2
