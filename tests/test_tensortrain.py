"""Port of test/test_tensortrain.jl (0-based indices)."""

import itertools

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu import TensorTrain, TensorTrainFit, TTCache


@pytest.mark.parametrize(
    "g",
    [
        lambda v: np.exp(np.exp(1j * sum(v))),
        lambda v: 1.0 / (sum(x**2 for x in v) + 1j),
    ],
)
def test_tensor_train(g):
    localdims = (6, 6, 6, 6)
    tolerance = 1e-8
    allindices = list(itertools.product(*[range(d) for d in localdims]))

    tciobj, ranks, errors = tci.crossinterpolate1(
        np.complex128, g, localdims, tolerance=tolerance
    )
    tt = tci.tensortrain(tciobj)
    ttr = tci.tt_reverse(tt)
    assert tciobj.rank() == tt.rank()
    assert tciobj.rank() == ttr.rank()
    assert tciobj.linkdims() == tt.linkdims()
    assert tciobj.linkdims() == ttr.linkdims()[::-1]

    gsum = 0.0
    for i in allindices:
        assert np.isclose(tciobj.evaluate(i), tt.evaluate(i))
        assert np.isclose(tciobj.evaluate(i), ttr.evaluate(tuple(reversed(i))))
        assert tt(i) == tt.evaluate(i)
        fv = g(i)
        assert abs(tt.evaluate(i) - fv) < tolerance
        assert abs(ttr.evaluate(tuple(reversed(i))) - fv) < tolerance
        gsum += fv
    assert np.isclose(gsum, tt.sum())
    assert np.isclose(gsum, ttr.sum())

    for method in ["LU", "CI", "SVD"]:
        ttc = tt.copy()
        ttc.compress(method, maxbonddim=5)
        assert ttc.rank() <= 5

    for method in ["LU", "CI", "SVD"]:
        ttc = tt.copy()
        ttc.compress(method, tolerance=1.0)
        assert ttc.rank() <= tt.rank()


def _fulltensor_bruteforce(tt):
    sitedims_ = tt.sitedims()
    localdims = [int(np.prod(d)) for d in sitedims_]
    vals = np.array(
        [
            tt.evaluate(list(i))
            for i in itertools.product(*[range(d) for d in localdims])
        ]
    )
    returnsize = [d for dims in sitedims_ for d in dims]
    return vals.reshape(returnsize)


@pytest.mark.parametrize("T", [np.float64, np.complex128])
def test_fulltensor(T, rng):
    linkdims = [1, 2, 3, 1]
    L = len(linkdims) - 1
    localdims = [4] * L

    def randn(*shape):
        x = rng.standard_normal(shape)
        if T == np.complex128:
            x = x + 1j * rng.standard_normal(shape)
        return x.astype(T)

    tts = TensorTrain(
        [randn(linkdims[n], localdims[n], linkdims[n + 1]) for n in range(L)]
    )
    assert np.allclose(_fulltensor_bruteforce(tts), tci.fulltensor(tts))


@pytest.mark.parametrize("T", [np.float64, np.complex128])
def test_shape_conversion(T, rng):
    linkdims = [1, 2, 3, 1]
    L = len(linkdims) - 1
    localdims = [4] * L
    tts = TensorTrain(
        [
            rng.standard_normal((linkdims[n], localdims[n], linkdims[n + 1])).astype(T)
            for n in range(L)
        ]
    )
    tto = tts.reshape_sites([[2, 2]] * L)
    tts_reconst = tto.reshape_sites([[4]] * L)
    for n in range(L):
        assert np.array_equal(tts[n], tts_reconst[n])
    with pytest.raises(ValueError):
        tts.reshape_sites([[2, 3]] * L)


def test_batchevaluate(rng):
    N = 4
    bonddims = [1, 2, 3, 2, 1]
    A = TTCache(
        [rng.random((bonddims[n], 2, bonddims[n + 1])) for n in range(N)]
    )
    leftindexset = [(0,), (1,)]
    rightindexset = [(0,), (1,)]
    result = A.batch_evaluate(leftindexset, rightindexset, 2)
    for cindex in [(0, 0), (0, 1)]:
        for il, lindex in enumerate(leftindexset):
            for ir, rindex in enumerate(rightindexset):
                assert np.isclose(
                    result[il, cindex[0], cindex[1], ir],
                    A.evaluate(lindex + cindex + rindex),
                )


def _genindices(localdims):
    return [tuple(i) for i in itertools.product(*[range(d) for d in localdims])]


def test_batchevaluate2(rng):
    N = 4
    bonddims = [1, 2, 3, 2, 1]
    localdims = [2, 3, 3, 2]
    A = TTCache(
        [rng.random((bonddims[n], localdims[n], bonddims[n + 1]))
         for n in range(N)]
    )
    for nleft in range(N + 1):
        for nright in range(N + 1):
            ncent = N - nleft - nright
            if ncent < 0:
                continue
            leftindexset = _genindices(localdims[:nleft])
            rightindexset = _genindices(localdims[N - nright:])
            result = A.batch_evaluate(leftindexset, rightindexset, ncent)
            for ic, cindex in enumerate(
                _genindices(localdims[nleft : nleft + ncent])
            ):
                for il, lindex in enumerate(leftindexset):
                    for ir, rindex in enumerate(rightindexset):
                        full = lindex + cindex + rindex
                        got = result[(il, *cindex, ir)]
                        assert np.isclose(got, A.evaluate(full, usecache=True))
                        assert np.isclose(got, A.evaluate(full, usecache=False))


@pytest.mark.parametrize("T", [np.float64, np.complex128])
def test_ttfit(T, rng):
    """TensorTrainFit minimized with jax gradients + scipy L-BFGS (replaces
    the reference's Zygote+Optim, test_tensortrain.jl:138-164)."""
    import jax
    import jax.numpy as jnp
    from scipy.optimize import minimize

    localdims = [2, 2, 2]
    linkdims = [1, 2, 3, 1]
    L = len(localdims)

    def randn(*shape):
        x = rng.standard_normal(shape)
        if T == np.complex128:
            x = x + 1j * rng.standard_normal(shape)
        return x.astype(T)

    tt0 = TensorTrain(
        [randn(linkdims[n], localdims[n], linkdims[n + 1]) for n in range(L)]
    )
    indexsets = [(0, 0, 0), (1, 1, 1)]
    values = randn(len(indexsets))
    ttfit = TensorTrainFit(indexsets, values, tt0)
    x0 = ttfit.flatten()

    iscomplex = T == np.complex128

    def pack(z):
        return np.concatenate([z.real, z.imag]) if iscomplex else z.real

    def unpack(x):
        if iscomplex:
            n = len(x) // 2
            return x[:n] + 1j * x[n:]
        return x

    def loss_real(x):
        if iscomplex:
            n = len(x) // 2
            z = x[:n] + 1j * x[n:]
        else:
            z = x
        return ttfit.loss_jax(z).real

    vg = jax.jit(jax.value_and_grad(loss_real))

    def fun(x):
        v, g = vg(jnp.asarray(x))
        return float(v), np.asarray(g)

    res = minimize(fun, pack(np.asarray(x0)), jac=True, method="L-BFGS-B")
    xopt = unpack(res.x)
    ttopt = TensorTrain(ttfit.to_tensors(xopt))
    fitted = [ttopt.evaluate(idx) for idx in indexsets]
    assert np.allclose(fitted, values, atol=1e-6)


@pytest.mark.parametrize("T", [np.float64, np.complex128])
def test_add_mul(T, rng):
    localdims = [2, 2, 2]
    linkdims = [1, 2, 3, 1]
    L = len(localdims)

    def randn(*shape):
        x = rng.standard_normal(shape)
        if T == np.complex128:
            x = x + 1j * rng.standard_normal(shape)
        return x.astype(T)

    tt1 = TensorTrain(
        [randn(linkdims[n], localdims[n], linkdims[n + 1]) for n in range(L)]
    )
    tt2 = TensorTrain(
        [randn(linkdims[n], localdims[n], linkdims[n + 1]) for n in range(L)]
    )
    indices = _genindices(localdims)
    ttadd = tci.add(tt1, tt2)
    assert np.allclose(
        [ttadd(v) for v in indices], [tt1(v) + tt2(v) for v in indices]
    )
    ttadd2 = tt1 + tt2
    assert np.allclose(
        [ttadd2(v) for v in indices], [tt1(v) + tt2(v) for v in indices]
    )
    tt1mul = 1.6 * tt1
    assert np.allclose(
        [tt1mul(v) for v in indices], [1.6 * tt1(v) for v in indices]
    )
    tt1div = tt1mul / 3.2
    assert np.allclose(
        [tt1div(v) for v in indices], [tt1(v) / 2.0 for v in indices]
    )
    tt1sub = tt1 - tt1div
    assert np.allclose(
        [tt1sub(v) for v in indices], [tt1(v) / 2.0 for v in indices]
    )

    ttshort = TensorTrain(
        [randn(linkdims[n], localdims[n], linkdims[n + 1]) for n in range(L - 1)]
    )
    with pytest.raises(ValueError):
        tci.add(tt1, ttshort)

    ttmultileg = TensorTrain(
        [
            randn(linkdims[n], localdims[n], localdims[n], linkdims[n + 1])
            for n in range(L)
        ]
    )
    with pytest.raises(ValueError):
        tci.add(tt1, ttmultileg)
    ttmultileg2 = ttmultileg + ttmultileg
    for v in indices:
        vv = list(zip(v, v))
        assert np.isclose(ttmultileg2(vv), 2 * ttmultileg(vv))


def test_norm():
    sitedims_ = [[2], [2], [2]]
    N = len(sitedims_)
    bonddims = [1, 1, 1, 1]
    tt = TensorTrain(
        [np.ones((bonddims[n], *sitedims_[n], bonddims[n + 1])) for n in range(N)]
    )
    proddims = float(np.prod([d[0] for d in sitedims_]))
    assert np.isclose(tci.norm2(tt), proddims)
    assert np.isclose(tci.norm2(2 * tt), 4 * proddims)
    assert np.isclose(tci.norm2(tt), tci.norm(tt) ** 2)


def test_compress_svd(rng):
    N = 10
    chi = 10
    tol = 0.1
    bonddims = [1] + [chi] * (N - 1) + [1]
    tt = TensorTrain(
        [rng.standard_normal((bonddims[n], 2, bonddims[n + 1])) for n in range(N)]
    )
    # normalizeerror=True
    ttc = tt.copy()
    ttc.compress("SVD", tolerance=tol)
    assert np.sqrt(tci.norm2(tt - ttc) / tci.norm2(tt)) < np.sqrt(N) * tol
    # normalizeerror=False
    ttc = tt.copy()
    ttc.compress("SVD", tolerance=tci.norm(tt) * tol, normalizeerror=False)
    assert np.sqrt(tci.norm2(tt - ttc) / tci.norm2(tt)) < np.sqrt(N) * tol


def test_cast(rng):
    localdims = [2, 2, 2]
    linkdims_ = [1, 2, 3, 1]
    L = len(localdims)
    tt1 = TensorTrain(
        [
            rng.standard_normal((linkdims_[n], localdims[n], linkdims_[n + 1]))
            for n in range(L)
        ]
    )
    tt2 = tt1.astype(np.complex128)
    assert np.allclose(tci.fulltensor(tt1), tci.fulltensor(tt2))
    tt3 = tt2.astype(np.float64)
    assert np.allclose(tci.fulltensor(tt1), tci.fulltensor(tt3))
