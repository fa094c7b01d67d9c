"""Port of test/test_matrixci.jl (0-based indices; fixtures verbatim)."""

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu import AtimesBinv, AinvtimesB, MatrixCI


def test_matrix_util():
    A = np.array([
        [0.262819, 0.740968, 0.505743],
        [0.422301, 0.831443, 0.32687],
        [0.439065, 0.426132, 0.453675],
        [0.128233, 0.0490983, 0.902257],
        [0.371653, 0.810275, 0.75838],
    ])
    assert np.allclose(AtimesBinv(A, np.eye(3)), A)
    assert np.allclose(AinvtimesB(np.eye(5), A), A)

    B = np.array([
        [0.852891, 0.945401, 0.585575],
        [0.800289, 0.478038, 0.661408],
        [0.685688, 0.619311, 0.309872],
    ])
    C = np.array([
        [0.304463, 0.399473, 0.767147, 0.337228, 0.86603],
        [0.147815, 0.508933, 0.794015, 0.326105, 0.8079],
        [0.665499, 0.0571589, 0.766872, 0.167927, 0.028576],
        [0.411886, 0.397681, 0.473644, 0.527007, 0.4264],
        [0.244107, 0.0669144, 0.347337, 0.947754, 0.76624],
    ])
    assert np.allclose(AtimesBinv(B, B), np.eye(3))
    assert np.allclose(AinvtimesB(B, B), np.eye(3))
    assert np.allclose(AtimesBinv(C, C), np.eye(5))
    assert np.allclose(AinvtimesB(C, C), np.eye(5))
    assert np.allclose(AtimesBinv(A, B), A @ np.linalg.inv(B))
    assert np.allclose(AinvtimesB(C, A), np.linalg.inv(C) @ A)


def test_empty_constructor():
    ci = MatrixCI(nrows=10, ncols=25)
    assert ci.rowindices == []
    assert ci.colindices == []
    assert ci.pivotcols.shape == (10, 0)
    assert ci.pivotrows.shape == (0, 25)
    assert ci.nrows() == 10
    assert ci.ncols() == 25
    assert ci.shape == (10, 25)
    assert ci.rank() == 0
    assert np.allclose(ci[:, :] if False else ci.submatrix(), np.zeros((10, 25)))
    for i in range(10):
        assert np.allclose(ci.row(i), np.zeros(25))
    for j in range(25):
        assert np.allclose(ci.col(j), np.zeros(10))


def test_full_constructor():
    A = np.array([
        [0.735188, 0.718229, 0.206528, 0.89223, 0.23432],
        [0.58692, 0.383284, 0.906576, 0.3389, 0.24915],
        [0.0866507, 0.812134, 0.683979, 0.798798, 0.63418],
        [0.694491, 0.585013, 0.623725, 0.25272, 0.72730],
        [0.100076, 0.248325, 0.770408, 0.342828, 0.080717],
        [0.748823, 0.653965, 0.47961, 0.909719, 0.037413],
        [0.902325, 0.743668, 0.193464, 0.380086, 0.91558],
        [0.0614368, 0.0709293, 0.343843, 0.197515, 0.45067],
    ])
    rowindices = [7, 1, 2]
    colindices = [0, 4, 3]
    ci = MatrixCI(rowindices, colindices, A[:, colindices], A[rowindices, :])
    assert ci.rowindices == rowindices
    assert ci.colindices == colindices
    assert np.array_equal(ci.pivotcols, A[:, colindices])
    assert np.array_equal(ci.pivotrows, A[rowindices, :])
    assert ci.nrows() == 8
    assert ci.ncols() == 5
    assert ci.shape == A.shape
    assert ci.rank() == 3

    Apivot = A[np.ix_(rowindices, colindices)]
    assert np.array_equal(ci.pivotmatrix(), Apivot)
    assert np.allclose(ci.leftmatrix(), A[:, colindices] @ np.linalg.inv(Apivot))
    assert np.allclose(ci.rightmatrix(), np.linalg.inv(Apivot) @ A[rowindices, :])
    assert ci.availablerows() == [0, 3, 4, 5, 6]
    assert ci.availablecols() == [1, 2]

    for i in rowindices:
        for j in colindices:
            assert np.isclose(ci.evaluate(i, j), A[i, j])
            assert np.isclose(ci[i, j], A[i, j])
    for i in rowindices:
        assert np.allclose(ci.row(i)[colindices], A[i, colindices])
        assert np.allclose(ci[i, colindices], A[i, colindices])
    for j in colindices:
        assert np.allclose(ci.col(j)[rowindices], A[rowindices, j])
        assert np.allclose(ci[rowindices, j], A[rowindices, j])

    assert np.allclose(
        ci.submatrix(rowindices, colindices), A[np.ix_(rowindices, colindices)]
    )
    assert np.allclose(
        ci.matrix()[np.ix_(rowindices, colindices)],
        A[np.ix_(rowindices, colindices)],
    )


def test_finding_pivots_trivial():
    A = np.ones((5, 3))
    ci = MatrixCI(nrows=5, ncols=3)

    with pytest.raises(ValueError):
        ci.addpivot(np.zeros((6, 6)), (0, 0))
    with pytest.raises((IndexError, ValueError)):
        ci.addpivot(A, (5, 2))
    with pytest.raises((IndexError, ValueError)):
        ci.addpivot(A, (4, 3))
    with pytest.raises(ValueError):
        ci.findnewpivot(A, [], [1, 2])
    with pytest.raises(ValueError):
        ci.findnewpivot(A, [0, 1], [])

    assert ci.rank() == 0
    ci.addpivot(A, (1, 2))
    assert ci.rowindices == [1]
    assert ci.colindices == [2]
    assert np.array_equal(ci.pivotrows, np.ones((1, 3)))
    assert np.array_equal(ci.pivotcols, np.ones((5, 1)))
    assert ci.rank() == 1
    for i in range(5):
        for j in range(3):
            assert np.isclose(ci.evaluate(i, j), 1.0)

    ci.addpivot(A)
    assert np.array_equal(ci.pivotrows, np.ones((2, 3)))
    assert np.array_equal(ci.pivotcols, np.ones((5, 2)))
    assert ci.rank() == 2
    ci.addpivot(A, (ci.availablerows()[0], ci.availablecols()[0]))
    assert ci.rank() == 3


def test_finding_pivots_rank1():
    A = np.outer([1.0, 2.0, 3.0], [2.0, 4.0, 8.0, 16.0])
    ci = MatrixCI(nrows=3, ncols=4)
    assert np.allclose(ci.localerror(A), A)
    pivot, err = ci.findnewpivot(A)
    assert pivot == (2, 3)
    assert err == 48.0
    ci.addpivot(A)
    ci2 = MatrixCI(A=A, firstpivot=(2, 3))
    assert ci.isapprox(ci2)
    assert ci.rowindices == [2]
    assert ci.colindices == [3]
    assert np.allclose(ci.pivotrows, 3.0 * np.array([[2.0, 4.0, 8.0, 16.0]]))
    assert np.allclose(ci.pivotcols, 16.0 * np.array([[1.0], [2.0], [3.0]]))
    assert np.allclose(ci.submatrix(), A)
    assert ci.availablerows() == [0, 1]
    assert ci.availablecols() == [0, 1, 2]

    ci.addpivot(A)
    assert len(ci.rowindices) == 2
    assert len(set(ci.rowindices)) == 2
    assert len(set(ci.colindices)) == 2
    assert np.allclose(ci.submatrix(), A)

    ci.addpivot(A)
    assert len(ci.rowindices) == 3
    with pytest.raises(ValueError):
        ci.findnewpivot(A)
    with pytest.raises(ValueError):
        ci.addpivot(A)


def test_crossinterpolate_smooth():
    grid = np.linspace(0, 1, 21)
    gauss = np.exp(-grid[:, None] ** 2 - grid[None, :] ** 2)
    cigauss = tci.matrix_crossinterpolate(gauss)
    assert cigauss.rank() == 1
    assert cigauss.nrows() == 21
    assert cigauss.ncols() == 21
    assert cigauss.rowindices == [0]
    assert cigauss.colindices == [0]

    lorentz = 1.0 / (1.0 + grid[:, None] ** 2 + grid[None, :] ** 2)
    cilorentz = tci.matrix_crossinterpolate(lorentz, tolerance=1e-6, maxiter=10)
    assert cilorentz.rank() == 5
    assert set(cilorentz.rowindices) == {20, 6, 11, 16, 0}
    assert set(cilorentz.colindices) == {20, 6, 11, 16, 0}
    assert np.max(np.abs(cilorentz.matrix() - lorentz)) < 1e-6
