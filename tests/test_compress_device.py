"""Device-resident whole-chain TT compression (models/compress_device.py)
vs the host two-pass compress (reference: src/tensortrain.jl:302-348)."""

import numpy as np
import pytest

from tci_tpu.models.compress_device import compress_device
from tci_tpu.models.tensortrain import TensorTrain, fulltensor


def _lowrank_tt(rng, L, chi, d, r, complex_=False):
    """Random TT of true bond rank r embedded in chi-sized bonds."""
    bonds = [1] + [chi] * (L - 1) + [1]
    ts = []
    for n in range(L):
        u = rng.standard_normal((bonds[n], d, r))
        v = rng.standard_normal((r, bonds[n + 1]))
        if complex_:
            u = u + 1j * rng.standard_normal(u.shape)
            v = v + 1j * rng.standard_normal(v.shape)
        ts.append((u @ v) / np.sqrt(r))
    return TensorTrain(ts)


def test_compress_device_matches_host(rng):
    tt = _lowrank_tt(rng, 6, 8, 3, 2)
    host = tt.copy()
    host.compress("LU", tolerance=1e-10)
    dev = compress_device(tt, "LU", tolerance=1e-10)
    assert dev.linkdims() == host.linkdims()
    assert max(dev.linkdims()) <= 2 * 3  # genuinely truncated from 8
    fh, fd = fulltensor(host), fulltensor(dev)
    assert np.allclose(fh, fd, atol=1e-9 * np.abs(fh).max())
    # and both still reproduce the original
    f0 = fulltensor(tt)
    assert np.allclose(fd, f0, atol=1e-8 * np.abs(f0).max())


def test_compress_device_maxbonddim(rng):
    tt = _lowrank_tt(rng, 5, 8, 3, 6)
    host = tt.copy()
    host.compress("LU", tolerance=0.0, maxbonddim=3)
    dev = compress_device(tt, "LU", tolerance=0.0, maxbonddim=3)
    assert dev.linkdims() == host.linkdims()
    assert max(dev.linkdims()) == 3
    fh, fd = fulltensor(host), fulltensor(dev)
    assert np.allclose(fh, fd, atol=1e-9 * np.abs(fh).max())


def test_compress_device_abstol_rule(rng):
    # normalizeerror=False routes tolerance through abstol
    tt = _lowrank_tt(rng, 5, 6, 3, 2)
    host = tt.copy()
    host.compress("LU", tolerance=1e-8, normalizeerror=False)
    dev = compress_device(tt, "LU", tolerance=1e-8, normalizeerror=False)
    assert dev.linkdims() == host.linkdims()
    fh, fd = fulltensor(host), fulltensor(dev)
    assert np.allclose(fh, fd, atol=1e-8 * max(1.0, np.abs(fh).max()))


def test_compress_device_complex_pair(rng):
    tt = _lowrank_tt(rng, 5, 6, 3, 2, complex_=True)
    host = tt.copy()
    host.compress("LU", tolerance=1e-10)
    dev = compress_device(tt, "LU", tolerance=1e-10)
    assert dev.linkdims() == host.linkdims()
    assert dev[0].dtype == np.complex128
    fh, fd = fulltensor(host), fulltensor(dev)
    assert np.allclose(fh, fd, atol=1e-9 * np.abs(fh).max())


def test_compress_device_mpo_cores(rng):
    # 4-leg (MPO) cores: mid dims are flattened generically
    bonds = [1, 5, 5, 1]
    ts = []
    for n in range(3):
        u = rng.standard_normal((bonds[n], 2, 3, 2))
        v = rng.standard_normal((2, bonds[n + 1]))
        ts.append(u @ v)
    tt = TensorTrain(ts)
    host = tt.copy()
    host.compress("LU", tolerance=1e-10)
    dev = compress_device(tt, "LU", tolerance=1e-10)
    assert dev.linkdims() == host.linkdims()
    assert all(t.ndim == 4 for t in dev.sitetensors())
    fh, fd = fulltensor(host), fulltensor(dev)
    assert np.allclose(fh, fd, atol=1e-9 * np.abs(fh).max())


def test_compress_jax_native_kwarg(rng):
    tt = _lowrank_tt(rng, 4, 6, 3, 2)
    a = tt.copy()
    a.compress("LU", tolerance=1e-10)
    b = tt.copy()
    b.compress("LU", tolerance=1e-10, jax_native=True)
    assert a.linkdims() == b.linkdims()
    fa, fb = fulltensor(a), fulltensor(b)
    assert np.allclose(fa, fb, atol=1e-9 * np.abs(fa).max())


def test_compress_device_rejects_svd(rng):
    tt = _lowrank_tt(rng, 3, 4, 2, 2)
    with pytest.raises(ValueError, match="method='LU'"):
        compress_device(tt, "SVD", tolerance=1e-10)


def test_compress_device_single_site(rng):
    tt = TensorTrain([rng.standard_normal((1, 4, 1))])
    dev = compress_device(tt, "LU", tolerance=1e-10)
    assert np.allclose(fulltensor(dev), fulltensor(tt))
