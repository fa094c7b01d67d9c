"""Port of test/test_matrixluci.jl (0-based indices)."""

import numpy as np

import tci_tpu as tci
from tci_tpu import MatrixCI, MatrixLUCI


def test_approximation_in_luci(rng):
    A = np.array([
        [0.684025, 0.784249, 0.826742, 0.054321, 0.0234695, 0.46709],
        [0.73928, 0.295516, 0.877126, 0.111711, 0.103509, 0.653785],
        [0.394016, 0.753239, 0.889128, 0.291669, 0.873509, 0.0965536],
        [0.378539, 0.0123737, 0.20112, 0.758088, 0.973042, 0.308372],
        [0.235156, 0.51939, 0.788184, 0.363171, 0.230001, 0.984971],
        [0.893223, 0.220834, 0.18001, 0.258537, 0.396583, 0.142105],
        [0.0417881, 0.890706, 0.328631, 0.279332, 0.963188, 0.706944],
        [0.914298, 0.792345, 0.311083, 0.129653, 0.350062, 0.683966],
    ])
    luci = MatrixLUCI(A, maxrank=4)
    assert luci.shape == A.shape
    assert len(luci.rowindices()) == 4
    assert len(luci.colindices()) == 4

    ri = list(luci.rowindices())
    ci_ = list(luci.colindices())
    ci = MatrixCI(ri, ci_, A[:, ci_], A[ri, :])
    assert np.allclose(luci.colstimespivotinv(), ci.leftmatrix())
    assert np.allclose(luci.pivotinvtimesrows(), ci.rightmatrix())

    L = luci.left()
    assert L.shape == (A.shape[0], 4)
    U = luci.right()
    assert U.shape == (4, A.shape[1])
    assert L.shape[1] == U.shape[0]
    assert np.allclose(L @ U, ci.submatrix())

    A2 = np.hstack([A, A + 1e-3 * rng.random((8, 6))])
    luci = MatrixLUCI(A2, reltol=1e-2)
    assert luci.shape == A2.shape
    assert len(luci.rowindices()) < A2.shape[0]
    assert len(luci.colindices()) < A2.shape[1]
    assert np.max(np.abs(luci.left() @ luci.right() - A2)) < 1e-2


def test_luci_exact_lowrank():
    p = np.array([
        [0.284975, 0.505168, 0.570921],
        [0.302884, 0.475901, 0.645776],
        [0.622955, 0.361755, 0.99539],
        [0.748447, 0.354849, 0.431366],
        [0.28338, 0.0378148, 0.994162],
        [0.643177, 0.74173, 0.802733],
        [0.58113, 0.526715, 0.879048],
        [0.238002, 0.557812, 0.251512],
        [0.458861, 0.141355, 0.0306212],
        [0.490269, 0.810266, 0.7946],
    ])
    q = np.array([
        [0.239552, 0.306094, 0.299063, 0.0382492, 0.185462, 0.0334971,
         0.697561, 0.389596, 0.105665, 0.0912763],
        [0.0570609, 0.56623, 0.97183, 0.994184, 0.371695, 0.284437,
         0.993251, 0.902347, 0.572944, 0.0531369],
        [0.45002, 0.461168, 0.6086, 0.613702, 0.543997, 0.759954,
         0.0959818, 0.638499, 0.407382, 0.482592],
    ])
    A = p @ q
    luci = MatrixLUCI(A)
    assert luci.npivots() == 3
    assert np.allclose(luci.left() @ luci.right(), A)
    pivotmatrix = luci.colmatrix()[: luci.npivots(), :]
    assert np.linalg.cond(pivotmatrix) < 1e12
