"""Tensor-parallel mesh-sharded rrLU (ops/lu_sharded.py) vs the
single-device kernel (ops/lu_kernel.py) on the virtual 8-device CPU mesh.

The sharded elimination must be BIT-IDENTICAL to the single-device path:
pivot order (incl. the reference's column-major first-occurrence tie-break,
matrixlu.jl:70-86), permutations, ranks and factors — the collectives are
exact (one-hot psum tables + local reduces), so any drift is a bug.
"""

import numpy as np
import pytest

from tci_tpu.ops.lu import rrlu
from tci_tpu.ops.lu_kernel import rrlu_raw
from tci_tpu.ops.lu_sharded import rrlu_sharded, rrlu_sharded_raw
from tci_tpu.parallel.mesh import default_mesh


@pytest.fixture(scope="module")
def mesh8():
    return default_mesh(8)


def _assert_raw_parity(A, maxrank, reltol, abstol, lo, mesh):
    s = rrlu_sharded_raw(A, maxrank, reltol, abstol, lo, mesh=mesh)
    r = rrlu_raw(A, maxrank, reltol, abstol, lo)
    assert s[3] == r[3]  # npivot
    assert np.array_equal(s[1], r[1])  # row permutation
    assert np.array_equal(s[2], r[2])  # col permutation
    assert np.allclose(s[0], r[0], atol=1e-12)  # LU buffer
    assert np.allclose(s[4], r[4])  # pivot magnitudes
    if np.isfinite(r[5]):
        assert np.isclose(s[5], r[5])  # residual error


@pytest.mark.parametrize("shape,lo", [
    ((100, 37), True),
    ((64, 64), True),
    ((33, 129), False),
    ((8, 8), False),
    ((7, 200), True),
])
def test_sharded_parity_full_rank(rng, shape, lo, mesh8):
    A = rng.standard_normal(shape)
    _assert_raw_parity(A, min(shape), 1e-14, 0.0, lo, mesh8)


def test_sharded_parity_truncation(rng, mesh8):
    U = rng.standard_normal((160, 6))
    V = rng.standard_normal((6, 90))
    A = U @ V
    s = rrlu_sharded_raw(A, 80, 1e-10, 0.0, True, mesh=mesh8)
    r = rrlu_raw(A, 80, 1e-10, 0.0, True)
    assert s[3] == r[3] == 6
    assert np.array_equal(s[1], r[1])
    assert np.array_equal(s[2], r[2])


def test_sharded_parity_abstol_and_maxrank(rng, mesh8):
    A = rng.standard_normal((96, 96))
    _assert_raw_parity(A, 17, 0.0, 1e-3, True, mesh8)
    _assert_raw_parity(A, 96, 0.0, np.abs(A).max() / 2, False, mesh8)


def test_sharded_parity_complex(rng, mesh8):
    A = rng.standard_normal((48, 40)) + 1j * rng.standard_normal((48, 40))
    _assert_raw_parity(A, 40, 1e-12, 0.0, True, mesh8)


def test_sharded_tie_break(mesh8):
    # duplicated maxima: the reference keeps the FIRST in column-major
    # order of the swapped layout; the sharded pmin-of-positions must agree
    A = np.zeros((24, 24))
    A[3, 5] = 2.0
    A[11, 5] = 2.0
    A[3, 17] = 2.0
    A += 0.01 * np.arange(24)[:, None]
    _assert_raw_parity(A, 24, 1e-14, 0.0, True, mesh8)


def test_sharded_rrlu_object(rng, mesh8):
    """rrlu_sharded reconstructs A like the host rrlu object."""
    U = rng.standard_normal((70, 9))
    V = rng.standard_normal((9, 55))
    A = U @ V
    lu_s = rrlu_sharded(A, reltol=1e-12, mesh=mesh8)
    lu_h = rrlu(A, reltol=1e-12)
    assert lu_s.npivot == lu_h.npivot == 9
    recon = lu_s.left() @ lu_s.right()
    assert np.allclose(recon, A, atol=1e-10 * np.abs(A).max())


def test_sharded_exact_zero_submatrix(mesh8):
    """Exact-rank matrix with reltol=abstol=0: stop on the exactly-zero
    pivot instead of dividing by zero (the round-2 advisor class)."""
    u = np.arange(1.0, 33.0)
    A = np.outer(u, u)
    s = rrlu_sharded_raw(A, 32, 0.0, 0.0, True, mesh=mesh8)
    assert s[3] == 1
    assert not np.any(np.isnan(s[0]))


def test_rrlu_mesh_kwarg(rng, mesh8):
    """rrlu(mesh=...) dispatches the tensor-parallel elimination and returns
    the same rrLU object as the single-device call."""
    U = rng.standard_normal((60, 7))
    V = rng.standard_normal((7, 44))
    A = U @ V
    lu_tp = rrlu(A, reltol=1e-12, mesh=mesh8)
    lu_1d = rrlu(A, reltol=1e-12)
    assert lu_tp.npivot == lu_1d.npivot == 7
    assert np.array_equal(lu_tp.rowpermutation, lu_1d.rowpermutation)
    assert np.allclose(lu_tp.left(), lu_1d.left(), atol=1e-12)


def test_sharded_empty_matrix_preserves_dtype(mesh8):
    """The empty fast path keeps rrlu_raw's dtype-preserving contract."""
    from tci_tpu.ops.lu_sharded import rrlu_sharded_raw

    out = rrlu_sharded_raw(np.zeros((0, 5), dtype=np.complex128), mesh=mesh8)
    assert out[0].dtype == np.complex128 and out[3] == 0
    out = rrlu_sharded_raw(np.zeros((4, 0)), mesh=mesh8)
    assert out[0].shape == (4, 0) and out[3] == 0


def test_sharded_default_mesh_single_device(rng):
    """mesh=None uses all available devices; on a 1-device mesh the
    program still runs (collectives become trivial)."""
    mesh1 = default_mesh(1)
    A = rng.standard_normal((20, 20))
    _assert_raw_parity(A, 20, 1e-14, 0.0, True, mesh1)
