"""Complex-as-(re,im)-pair kernels (ops/complex_pair.py) vs the complex
reference kernels on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

import tci_tpu as tci
from tci_tpu.ops.complex_pair import (
    ci_factors_pair,
    panel_solve_pinv_pair,
    rrlu_state_pair,
)
from tci_tpu.ops.lu_kernel import _rrlu_state
from tci_tpu.parallel.batcheval import JaxBatchEvaluator


@pytest.mark.parametrize("leftorthogonal", [True, False])
def test_pair_lu_matches_complex(leftorthogonal, rng):
    A = rng.standard_normal((12, 10)) + 1j * rng.standard_normal((12, 10))
    m, n, maxrank = 10, 9, 8
    args = (jnp.int32(m), jnp.int32(n), jnp.int32(maxrank),
            jnp.float64(1e-8), jnp.float64(0.0))
    Az = jnp.asarray(A)
    ref = _rrlu_state(Az, *args, leftorthogonal)
    out = rrlu_state_pair(jnp.real(Az), jnp.imag(Az), *args, leftorthogonal)

    Ar, Ai, rowperm, colperm, k, mags, err = out
    assert int(k) == int(ref[3])
    assert np.array_equal(np.asarray(rowperm), np.asarray(ref[1]))
    assert np.array_equal(np.asarray(colperm), np.asarray(ref[2]))
    assert np.allclose(
        np.asarray(Ar) + 1j * np.asarray(Ai), np.asarray(ref[0])
    )
    kk = int(k)
    assert np.allclose(np.asarray(mags)[:kk], np.asarray(ref[4])[:kk])
    assert np.isclose(float(err), float(ref[5]))


@pytest.mark.parametrize("leftorthogonal", [True, False])
def test_pair_factors_match(leftorthogonal, rng):
    from tci_tpu.ops.fused import ci_factors

    A = rng.standard_normal((12, 10)) + 1j * rng.standard_normal((12, 10))
    m, n, maxrank = 10, 9, 5
    args = (jnp.int32(m), jnp.int32(n), jnp.int32(maxrank),
            jnp.float64(0.0), jnp.float64(0.0))
    Az = jnp.asarray(A)
    Aout, rowperm, colperm, k, _, _ = _rrlu_state(Az, *args, leftorthogonal)
    lref, rref = ci_factors(Aout, rowperm, colperm, k, leftorthogonal,
                            jnp.complex128)
    lr, li, rr, ri = ci_factors_pair(
        jnp.real(Aout), jnp.imag(Aout), rowperm, colperm, k, leftorthogonal
    )
    kk = int(k)
    assert np.allclose(
        (np.asarray(lr) + 1j * np.asarray(li))[:, :kk],
        np.asarray(lref)[:, :kk],
    )
    assert np.allclose(
        (np.asarray(rr) + 1j * np.asarray(ri))[:kk, :],
        np.asarray(rref)[:kk, :],
    )


def test_pair_pinv_solve(rng):
    n_true = 6
    n = 8
    P = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    # identity-pad outside the true block
    P[n_true:, :] = 0
    P[:, n_true:] = 0
    P[range(n_true, n), range(n_true, n)] = 1
    Q = rng.standard_normal((5, n)) + 1j * rng.standard_normal((5, n))
    Q[:, n_true:] = 0

    Tr, Ti = panel_solve_pinv_pair(
        jnp.real(jnp.asarray(Q)), jnp.imag(jnp.asarray(Q)),
        jnp.real(jnp.asarray(P)), jnp.imag(jnp.asarray(P)),
        jnp.int32(n_true),
    )
    T = np.asarray(Tr) + 1j * np.asarray(Ti)
    Texp = Q[:, :n_true] @ np.linalg.inv(P[:n_true, :n_true])
    assert np.allclose(T[:, :n_true], Texp)


@pytest.mark.slow
def test_pair_full_tci_matches():
    def gpair(idx):
        v = idx.astype(jnp.float64) + 1.0
        s = jnp.sum(v)
        den = 1.0 + jnp.sum(v * v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    def gpy(x):
        v = np.asarray(x, float) + 1.0
        return np.exp(1j * np.sum(v)) / (1.0 + v @ v)

    localdims = [3] * 4
    bg = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                           pair_output=True)
    assert bg.fused_updater is not None
    assert bg.device_sweep_engine is not None
    assert bg.device_sweep_engine.pair
    t1, _, _ = tci.crossinterpolate2(np.complex128, bg, localdims,
                                     tolerance=1e-10)
    t2, _, _ = tci.crossinterpolate2(np.complex128, gpy, localdims,
                                     tolerance=1e-10)
    assert t1.Iset == t2.Iset
    assert np.allclose(
        tci.fulltensor(tci.tensortrain(t1)), tci.fulltensor(tci.tensortrain(t2))
    )


@pytest.mark.slow
def test_pair_scan_sweep_long_chain():
    """L >= 16 pair chains run the scan-based whole-sweep program
    (device_sweep._make_sweep_scan(pair=True)); must match the host complex
    path to tolerance."""
    L = 16
    localdims = [2] * L

    def gpair(idx):
        v = idx.astype(jnp.float64)
        wj = 1.0 + 0.3 * jnp.arange(L, dtype=jnp.float64)
        s = jnp.sum(v * wj) / 5.0
        den = 1.0 + jnp.sum(v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    def gpy(x):
        v = np.asarray(x, float)
        w = 1.0 + 0.3 * np.arange(L)
        return np.exp(1j * (v * w).sum() / 5.0) / (1.0 + v.sum())

    bg = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                           pair_output=True)
    assert bg.device_sweep_engine is not None and bg.device_sweep_engine.pair
    t1, _, _ = tci.crossinterpolate2(np.complex128, bg, localdims,
                                     tolerance=1e-8)
    # a direct whole-sweep call must use the engine (not fall back)
    assert bg.device_sweep_engine.sweep2site(
        t1, True, 1e-14, 1e-8, 2**31 - 1,
        [[] for _ in range(L)], [[] for _ in range(L)],
    )
    t2, _, _ = tci.crossinterpolate2(np.complex128, gpy, localdims,
                                     tolerance=1e-8)
    assert t1.linkdims() == t2.linkdims()
    f1 = tci.fulltensor(tci.tensortrain(t1))
    f2 = tci.fulltensor(tci.tensortrain(t2))
    assert np.abs(f1 - f2).max() < 1e-7


@pytest.mark.slow
@pytest.mark.parametrize("L", [8, 16])
def test_pair_sweep1site_and_fill(L):
    """Pair 1-site sweeps and fills run as whole-device programs (unrolled
    below scan_min_L=6, lax.scan at/above — both L here take the scan
    route) and match the host complex path."""
    localdims = [2] * L
    w = 1.0 + 0.3 * np.arange(L)

    def gpair(idx):
        v = idx.astype(jnp.float64)
        wj = 1.0 + 0.3 * jnp.arange(L, dtype=jnp.float64)
        s = jnp.sum(v * wj) / 5.0
        den = 1.0 + jnp.sum(v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    def gpy(x):
        v = np.asarray(x, float)
        return np.exp(1j * (v * w).sum() / 5.0) / (1.0 + v.sum())

    bg = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                           pair_output=True)
    t1, _, _ = tci.crossinterpolate2(np.complex128, bg, localdims,
                                     tolerance=1e-8)
    t2, _, _ = tci.crossinterpolate2(np.complex128, gpy, localdims,
                                     tolerance=1e-8)
    eng = bg.device_sweep_engine
    t1.invalidatesitetensors()
    assert eng.fillsitetensors(t1)
    t2.fillsitetensors(gpy)
    f1 = tci.fulltensor(tci.tensortrain(t1))
    f2 = tci.fulltensor(tci.tensortrain(t2))
    assert np.abs(f1 - f2).max() < 1e-10

    assert eng.sweep1site(t1, True, 0.0, 0.0, 2**31 - 1)
    t2.sweep1site(gpy, "forward", reltol=0.0, abstol=0.0,
                  maxbonddim=2**31 - 1)
    assert eng.sweep1site(t1, False, 1e-8, 0.0, 2**31 - 1)
    t2.sweep1site(gpy, "backward", reltol=1e-8, abstol=0.0,
                  maxbonddim=2**31 - 1)
    assert t1.linkdims() == t2.linkdims()
    s1 = tci.fulltensor(tci.tensortrain(t1))
    s2 = tci.fulltensor(tci.tensortrain(t2))
    assert np.abs(s1 - s2).max() < 1e-10
