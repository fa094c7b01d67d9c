"""Port of test/test_contraction.jl (0-based indices)."""

import itertools

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu import Contraction, TensorTrain, contract
from tci_tpu.models.contraction import _contract


def _tomat(tto: TensorTrain) -> np.ndarray:
    """Dense matrix of a 4-leg TT; row index fuses upper legs in C order."""
    sd = tto.sitedims()
    d1 = [s[0] for s in sd]
    d2 = [s[1] for s in sd]
    mat = np.empty((int(np.prod(d1)), int(np.prod(d2))), dtype=complex)
    for i, inds1 in enumerate(itertools.product(*[range(d) for d in d1])):
        for j, inds2 in enumerate(itertools.product(*[range(d) for d in d2])):
            mat[i, j] = tto.evaluate(list(zip(inds1, inds2)))
    return mat


def _tovec(tt: TensorTrain) -> np.ndarray:
    sd = tt.sitedims()
    d1 = [s[0] for s in sd]
    return np.array(
        [tt.evaluate(list(i))
         for i in itertools.product(*[range(d) for d in d1])]
    )


def test_contract_helper(rng):
    a = rng.random((2, 3, 4))
    b = rng.random((2, 5, 4))
    ab = _contract(a, b, (0, 2), (0, 2))
    ref = np.einsum("iak,ibk->ab", a, b)
    assert np.allclose(ab, ref)


def _gen_tto_tto(rng):
    N = 4
    bd = [1, 2, 3, 2, 1]
    d1 = [2] * N
    d2 = [3] * N
    d3 = [2] * N

    def crand(*shape):
        return rng.random(shape) + 1j * rng.random(shape)

    a = TensorTrain([crand(bd[n], d1[n], d2[n], bd[n + 1]) for n in range(N)])
    b = TensorTrain([crand(bd[n], d2[n], d3[n], bd[n + 1]) for n in range(N)])
    return N, a, b, d1, d2, d3


def _gen_tto_tts(rng):
    N = 4
    bd = [1, 2, 3, 2, 1]
    d1 = [3] * N
    d2 = [3] * N

    def crand(*shape):
        return rng.random(shape) + 1j * rng.random(shape)

    a = TensorTrain([crand(bd[n], d1[n], d2[n], bd[n + 1]) for n in range(N)])
    b = TensorTrain([crand(bd[n], d2[n], bd[n + 1]) for n in range(N)])
    return N, a, b, d1, d2


@pytest.mark.parametrize("f", [None, lambda x: 2 * x])
@pytest.mark.parametrize("algorithm", ["TCI", "naive"])
def test_mpo_mpo_contraction(f, algorithm, rng):
    N, a, b, d1, d2, d3 = _gen_tto_tto(rng)
    if f is not None and algorithm == "naive":
        with pytest.raises(ValueError):
            contract(a, b, f=f, algorithm=algorithm)
        return
    ab = contract(a, b, f=f, algorithm=algorithm)
    assert ab.sitedims() == [[d1[i], d3[i]] for i in range(N)]
    if f is None:
        assert np.allclose(_tomat(ab), _tomat(a) @ _tomat(b))
    else:
        assert np.allclose(_tomat(ab), f(_tomat(a) @ _tomat(b)))


def test_contraction_batchevaluate(rng):
    N, a, b, d1, d2, d3 = _gen_tto_tto(rng)
    ab = Contraction(a, b)
    leftindexset = [(0,)]
    rightindexset = [(0,)]

    ref = ab.batch_evaluate(leftindexset, rightindexset, 2)
    refm = ref.reshape(1, 2, 2, 2, 2, 1)

    res = ab.batch_evaluate(
        leftindexset, rightindexset, 2, projector=[[0, 0], [1, 0]]
    )
    assert np.allclose(refm[:, :, :, 0, :, :].reshape(-1), res.reshape(-1))

    res = ab.batch_evaluate(
        leftindexset, rightindexset, 2, projector=[[0, 0], [1, 1]]
    )
    assert np.allclose(refm[:, :, :, 0, 0, :].reshape(-1), res.reshape(-1))

    res = ab.batch_evaluate(
        leftindexset, rightindexset, 2, projector=[[0, 1], [1, 0]]
    )
    assert np.allclose(refm[:, :, 0, 0, :, :].reshape(-1), res.reshape(-1))


@pytest.mark.parametrize("f", [None, lambda x: 2 * x])
@pytest.mark.parametrize("algorithm", ["TCI", "naive"])
def test_mpo_mps_contraction(f, algorithm, rng):
    N, a, b, d1, d2 = _gen_tto_tts(rng)
    if f is not None and algorithm == "naive":
        with pytest.raises(ValueError):
            contract(a, b, f=f, algorithm=algorithm)
        with pytest.raises(ValueError):
            contract(b, a, f=f, algorithm=algorithm)
        return
    ab = contract(a, b, f=f, algorithm=algorithm)
    ba = contract(b, a, f=f, algorithm=algorithm)
    assert ab.sitedims() == [[d1[i]] for i in range(N)]
    if f is None:
        assert np.allclose(_tovec(ab), _tomat(a) @ _tovec(b))
        assert np.allclose(_tovec(ba), _tovec(b) @ _tomat(a))
    else:
        assert np.allclose(_tovec(ab), f(_tomat(a) @ _tovec(b)))
        assert np.allclose(_tovec(ba), f(_tovec(b) @ _tomat(a)))


@pytest.mark.parametrize("method", ["SVD", "LU"])
def test_mpo_mpo_zipup(method, rng):
    N, a, b, d1, d2, d3 = _gen_tto_tto(rng)
    ab = contract(a, b, algorithm="zipup", method=method)
    assert np.allclose(_tomat(ab), _tomat(a) @ _tomat(b))


@pytest.mark.parametrize("method", ["SVD", "LU"])
def test_mpo_mps_zipup(method, rng):
    N, a, b, d1, d2 = _gen_tto_tts(rng)
    ab = contract(a, b, algorithm="zipup", method=method)
    assert np.allclose(_tovec(ab), _tomat(a) @ _tovec(b))
