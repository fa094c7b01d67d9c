"""Seeded fuzz sweeps pitting every device tier against its host oracle.

These broaden tests/test_device_sweep.py::test_fuzz_engine_vs_host_random_configs
to the tiers it does not touch: whole-chain device compression
(models/compress_device.py), the device contraction algorithms
(models/contraction_device.py), the whole-sweep rook tier, and the complex
(re, im)-pair optimize loop. Each trial draws shapes/tolerances/knobs from a
seeded generator so failures are reproducible from the printed config.
"""

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu.models.compress_device import compress_device
from tci_tpu.models.contraction import contract
from tci_tpu.models.tensortrain import TensorTrain, fulltensor
from tci_tpu.parallel.batcheval import JaxBatchEvaluator

pytestmark = pytest.mark.slow


def _lowrank_tt(rng, L, chi, d, r, complex_=False, ndeficient=0):
    """Random TT of true bond rank <= r inside chi-wide bonds; the first
    ``ndeficient`` cores get an exactly repeated local channel (exact rank
    deficiency — the class of input that broke the device zero-reltol
    elimination in round 2's advisor finding)."""
    bonds = [1] + [chi] * (L - 1) + [1]
    ts = []
    for n in range(L):
        u = rng.standard_normal((bonds[n], d, r))
        v = rng.standard_normal((r, bonds[n + 1]))
        if complex_:
            u = u + 1j * rng.standard_normal(u.shape)
            v = v + 1j * rng.standard_normal(v.shape)
        t = (u @ v) / np.sqrt(r)
        if n < ndeficient and d >= 2:
            t[:, 1, :] = t[:, 0, :]
        ts.append(t)
    return TensorTrain(ts)


def test_fuzz_compress_device_vs_host():
    master = np.random.default_rng(424242)
    for trial in range(10):
        L = int(master.integers(3, 8))
        chi = int(master.integers(2, 10))
        d = int(master.integers(2, 5))
        r = int(master.integers(1, chi + 1))
        complex_ = bool(master.integers(0, 2))
        ndef = int(master.integers(0, 2)) * int(master.integers(0, L))
        tolerance = [0.0, 1e-10, 1e-6, 1e-3][int(master.integers(0, 4))]
        mbd = int(master.integers(1, 2 * chi)) if master.integers(0, 2) else 10**9
        normerr = bool(master.integers(0, 2))
        cfg = (trial, L, chi, d, r, complex_, ndef, tolerance, mbd, normerr)

        tt = _lowrank_tt(master, L, chi, d, r, complex_=complex_,
                         ndeficient=ndef)
        host = tt.copy()
        host.compress("LU", tolerance=tolerance, maxbonddim=mbd,
                      normalizeerror=normerr)
        dev = compress_device(tt, "LU", tolerance=tolerance, maxbonddim=mbd,
                              normalizeerror=normerr)
        assert dev.linkdims() == host.linkdims(), cfg
        fh, fd = fulltensor(host), fulltensor(dev)
        scale = max(1.0, np.abs(fh).max())
        assert np.allclose(fh, fd, atol=1e-8 * scale), cfg
        assert not np.any(np.isnan(fd)), cfg


def _rand_mpo(rng, L, chi, d1, d2, complex_=False):
    bonds = [1] + [chi] * (L - 1) + [1]
    ts = []
    for n in range(L):
        t = rng.standard_normal((bonds[n], d1, d2, bonds[n + 1]))
        if complex_:
            t = t + 1j * rng.standard_normal(t.shape)
        ts.append(t / np.sqrt(chi))
    return TensorTrain(ts)


def test_fuzz_contraction_device_vs_host():
    master = np.random.default_rng(515151)
    for trial in range(8):
        L = int(master.integers(3, 6))
        chiA = int(master.integers(2, 5))
        chiB = int(master.integers(2, 5))
        d1 = int(master.integers(2, 4))
        dm = int(master.integers(2, 4))
        d2 = int(master.integers(2, 4))
        complex_ = bool(master.integers(0, 2))
        algorithm = ["naive", "zipup"][int(master.integers(0, 2))]
        tolerance = [1e-12, 1e-8, 1e-4][int(master.integers(0, 3))]
        mbd = int(master.integers(2, 12)) if master.integers(0, 2) else 10**9
        cfg = (trial, L, chiA, chiB, d1, dm, d2, complex_, algorithm,
               tolerance, mbd)

        A = _rand_mpo(master, L, chiA, d1, dm, complex_=complex_)
        B = _rand_mpo(master, L, chiB, dm, d2, complex_=complex_)
        host = contract(A, B, algorithm=algorithm, tolerance=tolerance,
                        maxbonddim=mbd, method="LU")
        dev = contract(A, B, algorithm=algorithm, tolerance=tolerance,
                       maxbonddim=mbd, method="LU", jax_native=True)
        fd = fulltensor(dev)
        assert not np.any(np.isnan(fd)), cfg
        assert max(dev.linkdims()) <= mbd, cfg
        if algorithm == "naive" and mbd < chiA * chiB:
            # binding maxbonddim on an incompressible random product: the
            # device naive tier compresses per-bond during the merge while
            # the host does one global two-pass compress — both are valid
            # rank-mbd truncations but not the SAME one. Only the cap and
            # finiteness are contractual here
            # (tests/test_contraction_device.py::test_device_naive_maxbonddim).
            continue
        assert dev.linkdims() == host.linkdims(), cfg
        fh = fulltensor(host)
        scale = max(1.0, np.abs(fh).max())
        assert np.allclose(fh, fd, atol=1e-7 * scale), cfg


def test_fuzz_rook_device_converges():
    """Whole-sweep rook on random chains: the result must reproduce the full
    enumerated tensor to the requested tolerance (rook trajectories are not
    bit-comparable to full search, so the oracle is f itself)."""
    import jax.numpy as jnp

    master = np.random.default_rng(616161)
    for trial in range(5):
        L = int(master.integers(3, 6))
        localdims = [int(master.integers(2, 5)) for _ in range(L)]
        c = master.standard_normal(L) * 0.5
        w = 1.0 + master.random(L)
        cj, wj = jnp.asarray(c), jnp.asarray(w)
        cfg = (trial, localdims)

        def fj(idx, cj=cj, wj=wj):
            v = idx.astype(jnp.float64)
            return 1.0 / (1.0 + jnp.sum(wj * (v - cj) ** 2)) \
                + 0.1 * jnp.cos(jnp.sum(v * wj))

        bf = JaxBatchEvaluator(fj, localdims)
        t, r, e = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-9, pivotsearch="rook",
            rng=np.random.default_rng(trial),
        )
        ft = fulltensor(tci.tensortrain(t))
        grids = np.meshgrid(*[np.arange(dd, dtype=float) for dd in localdims],
                            indexing="ij")
        exact = 1.0 / (
            1.0 + sum(w[n] * (grids[n] - c[n]) ** 2 for n in range(L))
        ) + 0.1 * np.cos(sum(grids[n] * w[n] for n in range(L)))
        assert np.abs(ft - exact).max() < 1e-7 * np.abs(exact).max(), cfg


def test_fuzz_complex_pair_loop_vs_host():
    """Complex (re, im)-pair device loop vs the host scalar-sampling oracle:
    identical link dims and full tensors on random complex integrands."""
    import jax.numpy as jnp

    master = np.random.default_rng(717171)
    for trial in range(5):
        L = int(master.integers(3, 6))
        localdims = [int(master.integers(2, 5)) for _ in range(L)]
        tolerance = float(10.0 ** -master.integers(7, 11))
        strict = bool(master.integers(0, 2))
        c = master.standard_normal(L) * 0.4
        w = 1.0 + master.random(L)
        cj, wj = jnp.asarray(c), jnp.asarray(w)
        cfg = (trial, localdims, tolerance, strict)

        def gpair(idx, cj=cj, wj=wj):
            v = idx.astype(jnp.float64) + 1.0
            s = jnp.sum(v * wj)
            den = 1.0 + jnp.sum(wj * (v - cj) ** 2)
            return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

        def gpy(x, c=c, w=w):
            v = np.asarray(x, float) + 1.0
            s = float(np.sum(v * w))
            den = 1.0 + float(np.sum(w * (v - c) ** 2))
            return complex(np.cos(s) / den, np.sin(s) / den)

        bf = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                               pair_output=True)
        t1, r1, e1 = tci.crossinterpolate2(
            np.complex128, bf, localdims, tolerance=tolerance,
            strictlynested=strict, rng=np.random.default_rng(trial),
        )
        t2, r2, e2 = tci.crossinterpolate2(
            np.complex128, gpy, localdims, tolerance=tolerance,
            strictlynested=strict, rng=np.random.default_rng(trial),
        )
        assert t1.linkdims() == t2.linkdims(), cfg
        ft1 = fulltensor(tci.tensortrain(t1))
        ft2 = fulltensor(tci.tensortrain(t2))
        assert np.allclose(ft1, ft2, atol=1e-8), cfg


def test_fuzz_conversion_roundtrips():
    """Random configs through the conversion layer: TCI2 -> TT -> TCI2 and
    TCI2 -> TCI1 -> TCI2 must preserve link dims and pointwise values
    (reference test_conversion.jl:23-98 generalized over random shapes)."""
    from tci_tpu.models.conversion import (
        tci1_from_tci2,
        tci2_from_tci1,
        tci2_from_tensortrain,
    )

    master = np.random.default_rng(818181)
    for trial in range(4):
        L = int(master.integers(3, 6))
        localdims = [int(master.integers(2, 5)) for _ in range(L)]
        complex_ = bool(master.integers(0, 2))
        c = master.standard_normal(L) * 0.5
        cfg = (trial, localdims, complex_)

        if complex_:
            def fpy(x, c=c):
                v = np.asarray(x, float) + 1.0
                return np.exp(1j * v.sum()) / (1.0 + np.sum((v - c) ** 2))
            vt = np.complex128
        else:
            def fpy(x, c=c):
                v = np.asarray(x, float)
                return 1.0 / (1.0 + np.sum((v - c) ** 2))
            vt = np.float64

        t2, _, _ = tci.crossinterpolate2(
            vt, fpy, localdims, tolerance=1e-10,
            rng=np.random.default_rng(trial),
        )
        ft = fulltensor(tci.tensortrain(t2))

        # TT -> TCI2
        tb = tci2_from_tensortrain(tci.tensortrain(t2), tolerance=1e-12)
        assert tb.linkdims() == t2.linkdims(), cfg
        ftb = fulltensor(tci.tensortrain(tb))
        assert np.allclose(ftb, ft, atol=1e-9 * np.abs(ft).max()), cfg

        # TCI2 -> TCI1 -> TCI2
        t1 = tci1_from_tci2(t2, fpy)
        t2b = tci2_from_tci1(t1)
        assert t1.linkdims() == t2.linkdims(), cfg
        assert t2b.linkdims() == t2.linkdims(), cfg
        ft2b = fulltensor(tci.tensortrain(t2b))
        assert np.allclose(ft2b, ft, atol=1e-8 * np.abs(ft).max()), cfg


def test_fuzz_floatingzone_device_vs_host():
    """Device floating-zone program vs the host lock-step search on random
    tensor trains and start points: the best pivot/error must agree and
    every reported error must be self-consistent."""
    import jax.numpy as jnp

    from tci_tpu.models.globalsearch import (
        _floatingzone_batch,
        estimatetrueerror,
    )

    master = np.random.default_rng(919191)
    for trial in range(4):
        L = int(master.integers(4, 7))
        d = int(master.integers(2, 5))
        localdims = [d] * L
        w = 1.0 + master.random(L)
        wj = jnp.asarray(w)
        cfg = (trial, L, d)

        def fj(idx, wj=wj):
            v = idx.astype(jnp.float64) + 1.0
            return 1.0 / (1.0 + jnp.sum(wj * v * v)) + 0.05 * jnp.cos(
                3.1 * jnp.sum(v * wj)
            )

        bf = JaxBatchEvaluator(fj, localdims)
        t, _, _ = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-2, maxbonddim=3,
            rng=np.random.default_rng(trial),
        )
        tt = tci.tensortrain(t)
        starts = [
            tuple(int(x) for x in row)
            for row in master.integers(0, d, (10, L))
        ]
        dev = estimatetrueerror(tt, bf, initialpoints=starts)
        host = _floatingzone_batch(tt, bf, starts)
        assert len(dev) > 0, cfg
        errs = [e for _, e in dev]
        assert errs == sorted(errs, reverse=True), cfg
        host_best = max(host, key=lambda pe: pe[1])
        assert dev[0][0] == host_best[0], cfg
        assert np.isclose(dev[0][1], host_best[1], rtol=1e-9), cfg


def test_fuzz_tci1_vs_oracle():
    """TCI1 (the legacy ACA-based algorithm) on random smooth functions:
    the interpolation must reproduce the enumerated tensor to tolerance,
    real and complex, forward and back-and-forth sweeps."""
    master = np.random.default_rng(101010)
    for trial in range(4):
        L = int(master.integers(3, 6))
        localdims = [int(master.integers(2, 5)) for _ in range(L)]
        complex_ = bool(master.integers(0, 2))
        strategy = ["forward", "backandforth"][int(master.integers(0, 2))]
        c = master.standard_normal(L) * 0.5
        cfg = (trial, localdims, complex_, strategy)

        if complex_:
            def fpy(x, c=c):
                v = np.asarray(x, float) + 1.0
                return np.exp(1j * v.sum()) / (1.0 + np.sum((v - c) ** 2))
            vt = np.complex128
        else:
            def fpy(x, c=c):
                v = np.asarray(x, float)
                return 1.0 / (1.0 + np.sum((v - c) ** 2))
            vt = np.float64

        t1, ranks, errors = tci.crossinterpolate1(
            vt, fpy, localdims, [0] * L,
            tolerance=1e-10, maxiter=30, sweepstrategy=strategy,
        )
        ft = fulltensor(tci.tensortrain(t1))
        grids = np.meshgrid(*[np.arange(dd) for dd in localdims],
                            indexing="ij")
        pts = np.stack([g.ravel() for g in grids], axis=1)
        exact = np.asarray([fpy(p) for p in pts]).reshape(ft.shape)
        scale = np.abs(exact).max()
        assert np.abs(ft - exact).max() < 1e-8 * scale, cfg
