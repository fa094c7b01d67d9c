"""Mesh-sharded device contraction/compression (the L5/L3 tiers) on the
virtual 8-device CPU mesh: every bond split's complete-pivot elimination
runs tensor-parallel (ops/lu_sharded.make_lu_split_sharded) and must be
BIT-IDENTICAL to the single-device device tier for real dtypes."""

import numpy as np
import pytest

import jax

from tci_tpu.models.contraction import contract, contract_zipup
from tci_tpu.models.tensortrain import TensorTrain, fulltensor
from tci_tpu.parallel.mesh import default_mesh


def _rand_mpo(rng, L, chi, d1, d2):
    bonds = [1] + [chi] * (L - 1) + [1]
    return TensorTrain(
        [
            rng.standard_normal((bonds[n], d1, d2, bonds[n + 1]))
            for n in range(L)
        ]
    )


def _rand_cmpo(rng, L, chi, d1, d2):
    bonds = [1] + [chi] * (L - 1) + [1]
    return TensorTrain(
        [
            rng.standard_normal((bonds[n], d1, d2, bonds[n + 1]))
            + 1j * rng.standard_normal((bonds[n], d1, d2, bonds[n + 1]))
            for n in range(L)
        ]
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return default_mesh(8)


def _bits_equal(t1: TensorTrain, t2: TensorTrain):
    assert t1.linkdims() == t2.linkdims()
    for a, b in zip(t1.sitetensors(), t2.sitetensors()):
        np.testing.assert_array_equal(a, b)


def test_zipup_mesh_bit_identical(rng, mesh):
    A = _rand_mpo(rng, 5, 4, 3, 3)
    B = _rand_mpo(rng, 5, 5, 3, 2)
    single = contract_zipup(A, B, tolerance=1e-10, method="LU",
                            jax_native=True)
    sharded = contract_zipup(A, B, tolerance=1e-10, method="LU",
                             jax_native=True, mesh=mesh)
    _bits_equal(single, sharded)


def test_naive_mesh_bit_identical(rng, mesh):
    A = _rand_mpo(rng, 4, 4, 3, 3)
    B = _rand_mpo(rng, 4, 4, 3, 2)
    single = contract(A, B, algorithm="naive", tolerance=1e-10,
                      jax_native=True)
    sharded = contract(A, B, algorithm="naive", tolerance=1e-10,
                       jax_native=True, mesh=mesh)
    _bits_equal(single, sharded)
    exact = fulltensor(contract(A, B, algorithm="naive"))
    got = fulltensor(sharded)
    assert np.allclose(got, exact, atol=1e-9 * np.abs(exact).max())


def test_compress_mesh_bit_identical(rng, mesh):
    # rank-deficient chain so truncation actually happens
    L, chi, d, r = 5, 8, 3, 3
    bonds = [1] + [chi] * (L - 1) + [1]
    ts = []
    for n in range(L):
        u = rng.standard_normal((bonds[n], d, r))
        v = rng.standard_normal((r, bonds[n + 1]))
        ts.append((u @ v) / np.sqrt(r))
    t_single = TensorTrain([t.copy() for t in ts])
    t_mesh = TensorTrain([t.copy() for t in ts])
    t_single.compress("LU", tolerance=1e-10, jax_native=True)
    t_mesh.compress("LU", tolerance=1e-10, jax_native=True, mesh=mesh)
    assert max(t_single.linkdims()) <= r + 1  # genuinely truncated
    _bits_equal(t_single, t_mesh)


def test_compress_mesh_complex_pair(rng, mesh):
    """Complex chains shard through the (re, im) pair elimination
    (make_lu_split_sharded_pair); result must match the host compression
    to rounding."""
    L, chi, d = 4, 6, 3
    bonds = [1] + [chi] * (L - 1) + [1]
    ts = [
        rng.standard_normal((bonds[n], d, bonds[n + 1]))
        + 1j * rng.standard_normal((bonds[n], d, bonds[n + 1]))
        for n in range(L)
    ]
    t_host = TensorTrain([t.copy() for t in ts])
    t_mesh = TensorTrain([t.copy() for t in ts])
    t_host.compress("LU", tolerance=1e-10)
    t_mesh.compress("LU", tolerance=1e-10, jax_native=True, mesh=mesh)
    fh, fm = fulltensor(t_host), fulltensor(t_mesh)
    assert np.allclose(fh, fm, atol=1e-9 * np.abs(fh).max())


def test_zipup_mesh_complex_pair(rng, mesh):
    A = _rand_cmpo(rng, 4, 3, 2, 2)
    B = _rand_cmpo(rng, 4, 3, 2, 2)
    host = contract_zipup(A, B, tolerance=1e-10, method="LU")
    sharded = contract_zipup(A, B, tolerance=1e-10, method="LU",
                             jax_native=True, mesh=mesh)
    assert sharded.linkdims() == host.linkdims()
    fh, fs = fulltensor(host), fulltensor(sharded)
    assert np.allclose(fh, fs, atol=1e-9 * np.abs(fh).max())


@pytest.mark.slow
def test_tci_mesh_matches_single_device(rng, mesh):
    A = _rand_mpo(rng, 4, 3, 2, 2)
    B = _rand_mpo(rng, 4, 3, 2, 2)
    kw = dict(algorithm="TCI", tolerance=1e-10, jax_native=True)
    single = contract(A, B, rng=np.random.default_rng(3), **kw)
    sharded = contract(A, B, rng=np.random.default_rng(3), mesh=mesh, **kw)
    assert sharded.linkdims() == single.linkdims()
    exact = fulltensor(contract(A, B, algorithm="naive"))
    got = fulltensor(sharded)
    assert np.allclose(got, exact, atol=1e-8 * np.abs(exact).max())


def test_mesh_requires_jax_native(rng, mesh):
    A = _rand_mpo(rng, 3, 2, 2, 2)
    B = _rand_mpo(rng, 3, 2, 2, 2)
    with pytest.raises(ValueError, match="jax_native"):
        contract(A, B, algorithm="zipup", mesh=mesh)
    with pytest.raises(ValueError, match="jax_native"):
        contract(A, B, algorithm="naive", mesh=mesh)


def test_mesh_extent_invariance_real_and_pair(rng, mesh):
    """Results must be BITWISE independent of the mesh extent (1 vs 8
    devices): the collectives are exact (one-hot psum tables, one-owner
    broadcasts) and everything outside the shard_map is pinned replicated,
    so changing the device count must not change a single bit."""
    m1 = default_mesh(1)
    A = _rand_mpo(rng, 4, 4, 3, 3)
    B = _rand_mpo(rng, 4, 4, 3, 2)
    r1 = contract_zipup(A, B, tolerance=1e-10, method="LU",
                        jax_native=True, mesh=m1)
    r8 = contract_zipup(A, B, tolerance=1e-10, method="LU",
                        jax_native=True, mesh=mesh)
    _bits_equal(r1, r8)
    Ac = _rand_cmpo(rng, 4, 3, 2, 2)
    Bc = _rand_cmpo(rng, 4, 3, 2, 2)
    c1 = contract_zipup(Ac, Bc, tolerance=1e-10, method="LU",
                        jax_native=True, mesh=m1)
    c8 = contract_zipup(Ac, Bc, tolerance=1e-10, method="LU",
                        jax_native=True, mesh=mesh)
    _bits_equal(c1, c8)
