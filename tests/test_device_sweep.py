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


@pytest.mark.slow
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


@pytest.mark.slow
def test_device_engine_maxbonddim():
    localdims = [6] * 4
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    t1, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                     tolerance=1e-12, maxbonddim=3)
    t2, _, _ = tci.crossinterpolate2(np.float64, _fpy_lorentz, localdims,
                                     tolerance=1e-12, maxbonddim=3)
    assert t1.rank() <= 3
    assert t1.linkdims() == t2.linkdims()


@pytest.mark.slow
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


def _hjax(idx):
    import jax.numpy as jnp

    L = idx.shape[0]
    v = idx.astype(jnp.float64)
    w = 1.0 + 0.5 * jnp.arange(L, dtype=jnp.float64)
    return 1.0 / (1.0 + jnp.sum(v * w) + 0.3 * jnp.sum(v) ** 2)


@pytest.mark.slow
def test_scan_fill_and_sweep1site_match_unrolled():
    """The lax.scan variants (long chains) must be bit-identical to the
    unrolled programs on the same padded buffers."""
    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import (
        _make_fillsitetensors,
        _make_fillsitetensors_scan,
        _make_sweep1site,
        _make_sweep1site_scan,
    )

    L, Imax = 10, 16
    localdims = tuple([2] * L)
    bf = JaxBatchEvaluator(_hjax, list(localdims))
    t, _, _ = tci.crossinterpolate2(np.float64, bf, list(localdims),
                                    tolerance=1e-10)
    assert max(t.linkdims()) <= Imax

    Iset = np.zeros((L, Imax, L), dtype=np.int32)
    Ilen = np.zeros(L, np.int32)
    Jset = np.zeros((L, Imax, L), dtype=np.int32)
    Jlen = np.zeros(L, np.int32)
    for b in range(L):
        Ilen[b], Jlen[b] = len(t.Iset[b]), len(t.Jset[b])
        for r, idx in enumerate(t.Iset[b]):
            if idx:
                Iset[b, r, : len(idx)] = idx
        for r, idx in enumerate(t.Jset[b]):
            if idx:
                Jset[b, r, : len(idx)] = idx
    args = tuple(jnp.asarray(x) for x in (Iset, Ilen, Jset, Jlen))

    out_u, ms_u = _make_fillsitetensors(_hjax, localdims, Imax, jnp.float64)(
        *args
    )
    out_s, ms_s = _make_fillsitetensors_scan(
        _hjax, localdims, Imax, jnp.float64
    )(*args)
    assert np.isclose(float(ms_u), float(ms_s))
    for b in range(L):
        nr, d = int(Ilen[b]), localdims[b]
        nc = int(Ilen[b + 1]) if b < L - 1 else int(Jlen[b])
        assert np.allclose(
            np.asarray(out_u[b][:nr, :d, :nc]),
            np.asarray(out_s[b][:nr, :d, :nc]),
            atol=1e-12,
        ), f"fill mismatch at site {b}"

    extra = (jnp.float64(1e-10), jnp.float64(0.0), jnp.int32(2**31 - 1))
    for fwd in (True, False):
        ru = _make_sweep1site(_hjax, localdims, Imax, fwd, jnp.float64)(
            *args, *extra
        )
        rs = _make_sweep1site_scan(_hjax, localdims, Imax, fwd, jnp.float64)(
            *args, *extra
        )
        Il, Jl = np.asarray(ru[1]), np.asarray(ru[3])
        assert np.array_equal(Il, np.asarray(rs[1]))
        assert np.array_equal(Jl, np.asarray(rs[3]))
        for b in range(L):
            assert np.array_equal(
                np.asarray(ru[0])[b][: Il[b]], np.asarray(rs[0])[b][: Il[b]]
            )
            assert np.array_equal(
                np.asarray(ru[2])[b][: Jl[b]], np.asarray(rs[2])[b][: Jl[b]]
            )
            nr = int(Il[b])
            nc = int(Il[b + 1]) if b < L - 1 else int(Jl[b])
            assert np.allclose(
                np.asarray(ru[4])[b][:nr, :2, :nc],
                np.asarray(rs[4])[b][:nr, :2, :nc],
                atol=1e-12,
            )
        for i in (5, 6, 7):  # bonderrs, perrs, maxsample
            assert np.allclose(np.asarray(ru[i]), np.asarray(rs[i]))


def test_scan_2site_sweep_matches_unrolled():
    """_make_sweep_scan must reproduce _make_sweep bit-for-bit on uniform
    chains (padding to dmax is then the identity, so the candidate rows —
    and hence the pivot walk — are in the same order). This is the body
    the scan_min_L=6 default routes every BASELINE config through."""
    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import _make_sweep, _make_sweep_scan

    L, Imax = 6, 16
    localdims = tuple([3] * L)
    bf = JaxBatchEvaluator(_hjax, list(localdims))
    t, _, _ = tci.crossinterpolate2(np.float64, bf, list(localdims),
                                    tolerance=1e-6)
    assert max(t.linkdims()) <= Imax

    Iset = np.zeros((L, Imax, L), dtype=np.int32)
    Ilen = np.zeros(L, np.int32)
    Jset = np.zeros((L, Imax, L), dtype=np.int32)
    Jlen = np.zeros(L, np.int32)
    for b in range(L):
        Ilen[b], Jlen[b] = len(t.Iset[b]), len(t.Jset[b])
        for r, idx in enumerate(t.Iset[b]):
            if idx:
                Iset[b, r, : len(idx)] = idx
        for r, idx in enumerate(t.Jset[b]):
            if idx:
                Jset[b, r, : len(idx)] = idx
    extra = np.zeros((L, Imax, L), dtype=np.int32)
    extralen = np.zeros(L, np.int32)
    args = tuple(
        jnp.asarray(x)
        for x in (Iset, Ilen, Jset, Jlen, extra, extralen, extra, extralen)
    )
    tols = (jnp.float64(1e-10), jnp.float64(0.0), jnp.int32(2**31 - 1))

    for fwd in (True, False):
        ru = _make_sweep(_hjax, localdims, Imax, fwd, jnp.float64)(
            *args, *tols
        )
        rs = _make_sweep_scan(_hjax, localdims, Imax, fwd, jnp.float64)(
            *args, *tols
        )
        Il, Jl = np.asarray(ru[1]), np.asarray(ru[3])
        assert np.array_equal(Il, np.asarray(rs[1]))
        assert np.array_equal(Jl, np.asarray(rs[3]))
        for b in range(L):
            assert np.array_equal(
                np.asarray(ru[0])[b][: Il[b]], np.asarray(rs[0])[b][: Il[b]]
            ), f"Iset mismatch at bond {b} (forward={fwd})"
            assert np.array_equal(
                np.asarray(ru[2])[b][: Jl[b]], np.asarray(rs[2])[b][: Jl[b]]
            ), f"Jset mismatch at bond {b} (forward={fwd})"
        for i in (4, 5, 6):  # bonderrs, perrs, maxsample
            assert np.allclose(
                np.asarray(ru[i]), np.asarray(rs[i]), rtol=0, atol=0
            ), f"output {i} not bitwise (forward={fwd})"


@pytest.mark.slow
def test_long_chain_engine_fill_and_sweep1():
    """L >= 16 routes fill/1-site through the scan programs; results must
    agree with the host path to the optimization tolerance."""
    L = 18
    localdims = [2] * L

    def fjax(idx):
        import jax.numpy as jnp

        v = idx.astype(jnp.float64)
        w = 1.0 + 0.5 * jnp.arange(L, dtype=jnp.float64)
        return jnp.cos(jnp.sum(v * w) / 7.0) / (1.0 + jnp.sum(v))

    def fpy(x):
        v = np.asarray(x, float)
        w = 1.0 + 0.5 * np.arange(L)
        return np.cos((v * w).sum() / 7.0) / (1.0 + v.sum())

    bf = JaxBatchEvaluator(fjax, localdims)
    t1, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                     tolerance=1e-8)
    t2, _, _ = tci.crossinterpolate2(np.float64, fpy, localdims,
                                     tolerance=1e-8)
    assert t1.linkdims() == t2.linkdims()
    f2 = tci.fulltensor(tci.tensortrain(t2))

    eng = bf.device_sweep_engine
    t1.invalidatesitetensors()
    assert eng.fillsitetensors(t1)  # scan fill used, not the fallback
    f1 = tci.fulltensor(tci.tensortrain(t1))
    assert np.abs(f1 - f2).max() < 1e-7

    assert eng.sweep1site(t1, True, 0.0, 0.0, 2**31 - 1)
    t2.sweep1site(fpy, "forward", reltol=0.0, abstol=0.0,
                  maxbonddim=2**31 - 1)
    assert t1.linkdims() == t2.linkdims()
    s1 = tci.fulltensor(tci.tensortrain(t1))
    s2 = tci.fulltensor(tci.tensortrain(t2))
    assert np.abs(s1 - s2).max() < 1e-7


def test_engine_panel_edge_guard():
    """The engine declines (returns False) when Imax*(dmax+1) would exceed
    max_panel_edge (the probed program-size bound, 4096 by default in round
    3); callers then fall back to the per-bond fused tier. Pin a smaller
    edge here to exercise the guard mechanism itself."""
    from tci_tpu.models.device_sweep import DeviceSweepEngine
    from tci_tpu.models.tensorci2 import TensorCI2

    localdims = [15] * 4
    t = TensorCI2.from_function(lambda v: 1.0, localdims, dtype=np.float64)
    # grow the needed capacity above the pinned edge: 128 * 16 = 2048 > 1024
    t.Iset[1] = [(i % 15,) for i in range(15)] * 9  # 135 entries
    eng = DeviceSweepEngine(_fjax_lorentz, localdims, imax=64)
    eng.max_panel_edge = 1024
    empty = [[] for _ in range(4)]
    assert eng.sweep2site(t, True, 1e-14, 1e-8, 1000, empty, empty) is False
    assert eng.fillsitetensors(t) is False
    assert eng.sweep1site(t, True, 1e-14, 1e-8, 1000) is False
    # within the edge it still engages (use a tiny fresh state)
    t2 = TensorCI2.from_function(lambda v: 1.0, [4] * 4, dtype=np.float64)
    eng2 = DeviceSweepEngine(_fjax_lorentz, [4] * 4, imax=4)
    assert eng2.sweep2site(
        t2, True, 1e-14, 1e-8, 1000, [[] for _ in range(4)],
        [[] for _ in range(4)],
    ) is True


def test_scan_min_L_reassignment_rebuilds_programs():
    """Reassigning engine.scan_min_L after a program has been cached must
    build the other sweep variant, not silently return the stale one (the
    cache keys on the scan-vs-unrolled choice; the probe scripts rely on
    exactly this reassignment pattern)."""
    from tci_tpu.models.device_sweep import DeviceSweepEngine

    eng = DeviceSweepEngine(_fjax_lorentz, [4] * 6, imax=4)
    assert eng._scan_active()  # L=6 >= default scan_min_L=6
    scan_sweep = eng._get_sweep(True)
    scan_fill = eng._get_fill()
    eng.scan_min_L = 100  # force the unrolled variant
    assert not eng._scan_active()
    assert eng._get_sweep(True) is not scan_sweep
    assert eng._get_fill() is not scan_fill
    eng.scan_min_L = 6  # back: the scan programs come from cache
    assert eng._get_sweep(True) is scan_sweep
    assert eng._get_fill() is scan_fill


def test_whole_sweep_rook_converges_and_matches_full():
    """pivotsearch='rook' with a device-sweep-capable evaluator runs the
    whole-sweep rook program (one dispatch per sweep; traced slab
    alternation, matrixlu.jl:492-569) and must converge to the same
    interpolation as the full-search path, with fewer samples."""
    localdims = [6] * 5
    coef = np.arange(1, 6, dtype=float)

    def fjax(idx):
        import jax.numpy as jnp

        v = idx.astype(jnp.float64) * jnp.asarray(coef)
        return 1.0 / (1.0 + jnp.sum(v * v))

    fpy = lambda x: 1.0 / (
        1.0 + float(np.sum((np.asarray(x, float) * coef) ** 2))
    )

    bf = JaxBatchEvaluator(fjax, localdims)
    t1, r1, e1 = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-9, pivotsearch="rook",
        rng=np.random.default_rng(7),
    )
    assert e1[-1] < 1e-9
    # rook must report a real residual, not the exact-slab zero
    assert e1[-1] > 0.0
    bf2 = JaxBatchEvaluator(fjax, localdims)
    t2, r2, e2 = tci.crossinterpolate2(
        np.float64, bf2, localdims, tolerance=1e-9, pivotsearch="full",
        rng=np.random.default_rng(7),
    )
    assert t1.rank() == t2.rank()
    # slab sampling must cost fewer evaluations than full panels
    assert bf.device_sweep_engine.nevals < bf2.device_sweep_engine.nevals
    for v in [(0, 0, 0, 0, 0), (1, 2, 3, 4, 5), (5, 4, 3, 2, 1), (2, 0, 5, 1, 3)]:
        assert abs(t1.evaluate(v) - fpy(v)) < 1e-8


def test_whole_sweep_rook_no_global_search():
    """Without the global-search safety net, rook's residual bookkeeping
    (wide-slab error carry) must still prevent premature convergence."""
    localdims = [5] * 4

    def fjax(idx):
        import jax.numpy as jnp

        v = idx.astype(jnp.float64) + 1.0
        return jnp.cos(jnp.sum(v * v)) / (1.0 + jnp.sum(v))

    fpy = lambda x: float(
        np.cos(np.sum((np.asarray(x, float) + 1.0) ** 2))
        / (1.0 + np.sum(np.asarray(x, float) + 1.0))
    )
    bf = JaxBatchEvaluator(fjax, localdims)
    t, ranks, errs = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-10, nsearchglobalpivot=0,
        pivotsearch="rook", rng=np.random.default_rng(11),
    )
    assert errs[-1] < 1e-10
    for v in [(0, 0, 0, 0), (1, 2, 3, 4), (4, 3, 2, 1), (2, 0, 4, 1)]:
        assert abs(t.evaluate(v) - fpy(v)) < 1e-8


def test_rook_scan_matches_unrolled_exactly():
    """_make_sweep_rook_scan must reproduce _make_sweep_rook bit-for-bit:
    the same seed drives the same random slab fills (fold_in(key, b) in
    both variants), so pivot sets, bond errors and sample counts agree."""
    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import (
        _make_sweep_rook,
        _make_sweep_rook_scan,
    )

    localdims = (5,) * 6
    L = len(localdims)
    Imax = 8

    def fjax(idx):
        v = idx.astype(jnp.float64) + 1.0
        return 1.0 / (1.0 + jnp.sum(v * v))

    rng = np.random.default_rng(3)
    Iset = np.zeros((L, Imax, L), dtype=np.int32)
    Jset = np.zeros((L, Imax, L), dtype=np.int32)
    Ilen = np.zeros((L,), dtype=np.int32)
    Jlen = np.zeros((L,), dtype=np.int32)
    for b in range(L):
        nI = 1 if b == 0 else 3
        Ilen[b] = nI
        Iset[b, :nI, :b] = rng.integers(0, 5, (nI, b))
        nJ = 1 if b == L - 1 else 3
        Jlen[b] = nJ
        Jset[b, :nJ, : L - b - 1] = rng.integers(0, 5, (nJ, L - b - 1))
    eI = np.zeros((L, Imax, L), dtype=np.int32)
    eJ = np.zeros((L, Imax, L), dtype=np.int32)
    elen = np.zeros((L,), dtype=np.int32)

    for forward in (True, False):
        unrolled = _make_sweep_rook(fjax, localdims, Imax, forward,
                                    jnp.float64)
        scanned = _make_sweep_rook_scan(fjax, localdims, Imax, forward,
                                        jnp.float64)
        args = (
            jnp.asarray(Iset), jnp.asarray(Ilen),
            jnp.asarray(Jset), jnp.asarray(Jlen),
            jnp.asarray(eI), jnp.asarray(elen),
            jnp.asarray(eJ), jnp.asarray(elen),
            jnp.float64(1e-10), jnp.float64(0.0), jnp.int32(Imax),
            jnp.int32(42),
        )
        out_u = [np.asarray(x) for x in unrolled(*args)]
        out_s = [np.asarray(x) for x in scanned(*args)]
        names = ["Iset", "Ilen", "Jset", "Jlen", "bonderrs", "perrs",
                 "maxsample", "nevals"]
        for n, u, s in zip(names, out_u, out_s):
            np.testing.assert_allclose(s, u, rtol=0, atol=0, err_msg=n)


def test_rook_long_chain_uses_scan_and_converges():
    """L>=16 rook no longer falls back to per-bond: the scan-based rook
    program runs and converges to the full-search interpolation."""
    L = 16
    localdims = [2] * L

    def fjax(idx):
        import jax.numpy as jnp

        # smooth function of the binary fraction encoded by the chain
        w = 2.0 ** -jnp.arange(1, L + 1, dtype=jnp.float64)
        x = jnp.sum(idx.astype(jnp.float64) * w)
        return jnp.exp(-3.0 * x) * jnp.cos(4.0 * x)

    bf = JaxBatchEvaluator(fjax, localdims)
    t1, r1, e1 = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-10, pivotsearch="rook",
        rng=np.random.default_rng(5),
    )
    assert e1[-1] < 1e-10
    eng = bf.device_sweep_engine
    assert eng is not None and eng.nevals > 0

    def fpy(v):
        x = sum(int(b) * 2.0 ** -(i + 1) for i, b in enumerate(v))
        return float(np.exp(-3.0 * x) * np.cos(4.0 * x))

    for v in [(0,) * L, (1,) * L, tuple(i % 2 for i in range(L))]:
        assert abs(t1.evaluate(v) - fpy(v)) < 1e-9


def test_rook_scan_nonuniform_dims_converges():
    """Non-uniform localdims exercise the scan rook body's dmax padding and
    validity masks (the only path that differs nontrivially from the
    uniform case, where scan == unrolled bit-for-bit); results must match
    the full-search interpolation pointwise."""
    L = 16
    localdims = [3, 2] * (L // 2)

    def fjax(idx):
        import jax.numpy as jnp

        w = 1.0 / (1.0 + jnp.arange(L, dtype=jnp.float64))
        x = jnp.sum(idx.astype(jnp.float64) * w)
        return 1.0 / (1.0 + x * x)

    def fpy(v):
        w = 1.0 / (1.0 + np.arange(L, dtype=float))
        x = float(np.sum(np.asarray(v, float) * w))
        return 1.0 / (1.0 + x * x)

    bf = JaxBatchEvaluator(fjax, localdims)
    t1, r1, e1 = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-10, pivotsearch="rook",
        rng=np.random.default_rng(11),
    )
    assert e1[-1] < 1e-10
    bf2 = JaxBatchEvaluator(fjax, localdims)
    t2, _, _ = tci.crossinterpolate2(
        np.float64, bf2, localdims, tolerance=1e-10, pivotsearch="full",
        rng=np.random.default_rng(11),
    )
    assert t1.rank() == t2.rank()
    for v in [(0,) * L, tuple((i + 1) % 2 for i in range(L)),
              tuple(min(i, localdims[i] - 1) % localdims[i] for i in range(L))]:
        assert abs(t1.evaluate(v) - fpy(v)) < 1e-9


def test_fused_sweep_fill_matches_separate_fill():
    """fill_sites=True computes site tensors inside the sweep program; they
    must equal what the standalone fill program computes for the same final
    pivot sets (and what the host setsitetensor_from_f path computes)."""
    from tci_tpu.models.tensorci2 import TensorCI2

    localdims = [4] * 5
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    engine = bf.device_sweep_engine
    t = TensorCI2.from_function(_fpy_lorentz, localdims, dtype=np.float64)
    n = len(localdims)
    extra = [[] for _ in range(n)]
    assert engine.sweep2site(t, True, 1e-14, 1e-10, 2**31 - 1, extra, extra,
                             fill_sites=True)
    assert engine.last_sweep_filled
    fused_tensors = [np.array(t._sitetensors[b]) for b in range(n)]
    # recompute with the standalone fill program
    t.invalidatesitetensors()
    assert engine.fillsitetensors(t)
    for b in range(n):
        assert np.allclose(fused_tensors[b], t._sitetensors[b], atol=1e-13)
    # and against the host path
    t.invalidatesitetensors()
    for b in range(n):
        t.setsitetensor_from_f(_fpy_lorentz, b)
        assert np.allclose(fused_tensors[b], t._sitetensors[b], atol=1e-10)


def test_optimize_skips_separate_fill_dispatch():
    """With a device engine, optimize's final sweep fuses the fill: the
    separate fill program must not be dispatched (engine.last_sweep_filled
    set, site tensors present and correct)."""
    localdims = [4] * 5
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    t1, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                     tolerance=1e-10)
    engine = bf.device_sweep_engine
    # the last 2-site sweep of the last optimize iteration ran fused
    # (sweep1site afterwards recomputes tensors; the flag tracks the last
    # fused call)
    assert hasattr(engine, "last_sweep_filled")
    for idx in [(0, 1, 2, 3, 0), (3, 3, 3, 3, 3)]:
        assert abs(t1(idx) - _fpy_lorentz(idx)) < 1e-8


@pytest.mark.parametrize("strictlynested", [False, True])
def test_sweep_pair_equals_per_sweep(strictlynested):
    """The fused two-sweep pair program (one dispatch per optimize
    iteration) must reproduce the per-sweep engine path exactly: same
    pivot sets, same history bookkeeping, same error series, same site
    tensors."""
    localdims = [4] * 5
    results = []
    for use_pair in (True, False):
        bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
        bf.device_sweep_engine.use_sweep_pair = use_pair
        t, r, e = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-10,
            strictlynested=strictlynested,
        )
        results.append((t, r, e))
    (t1, r1, e1), (t2, r2, e2) = results
    assert t1.Iset == t2.Iset
    assert t1.Jset == t2.Jset
    assert t1.Iset_history == t2.Iset_history
    assert t1.Jset_history == t2.Jset_history
    assert r1 == r2
    assert np.allclose(e1, e2)
    for a, b in zip(t1.sitetensors(), t2.sitetensors()):
        assert np.allclose(a, b, atol=1e-12)


@pytest.mark.slow
def test_sweep_pair_rook_parity():
    """Pair program with rook: identical RNG seeding must give identical
    results to two sequential rook sweeps (the pair draws its two seeds
    as two scalar draws to match the sequential stream)."""
    localdims = [4] * 5  # uniform chain -> scan rook body
    results = []
    for use_pair in (True, False):
        bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
        eng = bf.device_sweep_engine
        eng.use_sweep_pair = use_pair
        eng._rng = np.random.default_rng(7)
        t, r, e = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-10, pivotsearch="rook",
        )
        results.append((t, r, e))
    (t1, r1, e1), (t2, r2, e2) = results
    assert t1.Iset == t2.Iset
    assert t1.Jset == t2.Jset
    assert t1.Iset_history == t2.Iset_history
    assert r1 == r2
    assert np.allclose(e1, e2)
    for a, b in zip(t1.sitetensors(), t2.sitetensors()):
        assert np.allclose(a, b, atol=1e-12)


def test_sweep_pair_capacity_growth():
    """Pair path under forced buffer growth still matches the host path."""
    from tci_tpu.models.device_sweep import DeviceSweepEngine as DSE

    localdims = [4] * 4
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    bf._device_sweep_engine = DSE(_fjax_lorentz, localdims, imax=2)
    t1, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                     tolerance=1e-12)
    t2, _, _ = tci.crossinterpolate2(np.float64, _fpy_lorentz, localdims,
                                     tolerance=1e-12)
    assert t1.linkdims() == t2.linkdims()
    assert np.allclose(
        tci.fulltensor(tci.tensortrain(t1)),
        tci.fulltensor(tci.tensortrain(t2)),
    )
    assert bf._device_sweep_engine.Imax > 2


def test_fused_search_matches_host_finder():
    """The in-program global-pivot candidate search (search_starts on the
    sweep-pair program) must select the same pivots as the host
    DefaultGlobalPivotFinder run from the same start points against the
    same (post-pair) tensor train."""
    from tci_tpu.models.globalpivotfinder import (
        DefaultGlobalPivotFinder,
        GlobalPivotSearchInput,
    )

    localdims = [4, 3, 5, 4]  # non-uniform: exercises clamp + mask
    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    t, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                    tolerance=1e-8)
    engine = bf.device_sweep_engine
    rng = np.random.default_rng(11)
    finder = DefaultGlobalPivotFinder(nsearch=6, maxnglobalpivot=6)
    starts = finder.draw_starts(localdims, rng)
    n = len(localdims)
    ok = engine.sweep2site_pair(
        t, True, False, 1e-14, 1e-8, 2**31 - 1,
        [[] for _ in range(n)], [[] for _ in range(n)],
        search_starts=np.asarray(starts, dtype=np.int32),
    )
    assert ok and engine.last_search is not None
    best_flat, best_err = engine.last_search

    # tiny abstol: every start's best point passes the threshold, so the
    # comparison covers the full per-start argmax, not just the filter
    abstol = 1e-16
    dev = finder.select_device_result(
        starts, best_flat, best_err, max(localdims), abstol
    )
    host = finder(
        GlobalPivotSearchInput.from_tci(t), bf, abstol,
        initial_points=starts,
    )
    assert dev == host


@pytest.mark.slow
def test_fused_search_complex_pair():
    """Same in-program search parity for a complex integrand carried as
    (re, im) pairs."""
    from tci_tpu.models.globalpivotfinder import (
        DefaultGlobalPivotFinder,
        GlobalPivotSearchInput,
    )

    import jax.numpy as jnp

    def gpair(idx):
        v = idx.astype(jnp.float64) + 1.0
        s = jnp.sum(v)
        den = 1.0 + jnp.sum(v * v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    localdims = [3] * 4
    bg = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                           pair_output=True)
    t, _, _ = tci.crossinterpolate2(np.complex128, bg, localdims,
                                    tolerance=1e-8)
    engine = bg.device_sweep_engine
    assert engine.pair
    finder = DefaultGlobalPivotFinder(nsearch=5, maxnglobalpivot=5)
    starts = finder.draw_starts(localdims, np.random.default_rng(4))
    n = len(localdims)
    ok = engine.sweep2site_pair(
        t, True, False, 1e-14, 1e-8, 2**31 - 1,
        [[] for _ in range(n)], [[] for _ in range(n)],
        search_starts=np.asarray(starts, dtype=np.int32),
    )
    assert ok and engine.last_search is not None
    best_flat, best_err = engine.last_search
    abstol = 1e-16
    dev = finder.select_device_result(
        starts, best_flat, best_err, max(localdims), abstol
    )
    host = finder(
        GlobalPivotSearchInput.from_tci(t), bg, abstol,
        initial_points=starts,
    )
    assert dev == host


def test_optimize_fused_search_end_to_end():
    """optimize() with the fused in-program search must follow the same
    trajectory as the unfused path (pair disabled -> host finder), given
    the same rng seed: the start points come from the same stream and the
    candidate argmax agrees."""
    localdims = [4] * 5
    results = []
    for use_pair in (True, False):
        bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
        bf.device_sweep_engine.use_sweep_pair = use_pair
        t, r, e = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-10,
            rng=np.random.default_rng(21),
        )
        results.append((t, r, e))
    (t1, r1, e1), (t2, r2, e2) = results
    assert t1.Iset == t2.Iset
    assert t1.Jset == t2.Jset
    assert r1 == r2
    assert np.allclose(e1, e2)


def test_optimize_dispatch_counts(monkeypatch):
    """Dispatch accounting of the fused execution tiers.

    Default path (multi-iteration loop): a whole pivot-free optimization
    is O(1) optimize_loop dispatches — NOT O(iterations) — and the finder
    triggers no separate batched-evaluation dispatch. With the loop
    disabled, every iteration is exactly one sweep2site_pair dispatch."""
    from tci_tpu.models.device_sweep import DeviceSweepEngine

    localdims = [4] * 5

    calls = {"pair": 0, "loop": 0, "many": 0}
    orig_pair = DeviceSweepEngine.sweep2site_pair
    orig_loop = DeviceSweepEngine.optimize_loop

    def counting_pair(self, *a, **k):
        calls["pair"] += 1
        return orig_pair(self, *a, **k)

    def counting_loop(self, *a, **k):
        calls["loop"] += 1
        return orig_loop(self, *a, **k)

    monkeypatch.setattr(DeviceSweepEngine, "sweep2site_pair", counting_pair)
    monkeypatch.setattr(DeviceSweepEngine, "optimize_loop", counting_loop)

    bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
    orig_many = type(bf).evaluate_many

    def counting_many(self, rows):
        calls["many"] += 1
        return orig_many(self, rows)

    monkeypatch.setattr(type(bf), "evaluate_many", counting_many)

    t, ranks, errors = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-10
    )
    assert errors[-1] < 1e-10
    niter = len(ranks)
    assert niter >= 3
    # whole optimization in O(1) loop dispatches (growth retries allowed)
    assert calls["loop"] <= 3, calls
    assert calls["pair"] == 0, calls
    # no separate finder dispatches beyond from_function's initial pivot
    assert calls["many"] <= 2, calls

    # loop disabled -> exactly the per-iteration pair path
    calls.update(pair=0, loop=0, many=0)
    bf2 = JaxBatchEvaluator(_fjax_lorentz, localdims)
    monkeypatch.setattr(type(bf2), "evaluate_many", counting_many)
    bf2.device_sweep_engine.use_optimize_loop = False
    t2, ranks2, errors2 = tci.crossinterpolate2(
        np.float64, bf2, localdims, tolerance=1e-10
    )
    assert errors2[-1] < 1e-10
    assert calls["loop"] == 0
    assert calls["pair"] >= len(ranks2)
    assert calls["many"] <= 2, calls


def _loop_vs_pair(localdims, make_bf, seed, _vt=np.float64,
                  initialpivots=None, **kwargs):
    """Run crossinterpolate2 with the multi-iteration device loop on/off
    and assert full trajectory parity (ranks, error series, pivot sets,
    history, site tensors)."""
    res = []
    for use_loop in (True, False):
        bf = make_bf()
        bf.device_sweep_engine.use_optimize_loop = use_loop
        t, r, e = tci.crossinterpolate2(
            _vt, bf, localdims, initialpivots,
            rng=np.random.default_rng(seed), **kwargs,
        )
        res.append((t, r, e))
    (t1, r1, e1), (t2, r2, e2) = res
    assert r1 == r2
    assert np.allclose(e1, e2)
    assert t1.Iset == t2.Iset
    assert t1.Jset == t2.Jset
    assert t1.Iset_history == t2.Iset_history
    assert t1.Jset_history == t2.Jset_history
    for a, b in zip(t1.sitetensors(), t2.sitetensors()):
        assert np.allclose(a, b, atol=1e-12)
    return res


@pytest.mark.parametrize("strictlynested", [False, True])
def test_optimize_loop_equals_per_iteration(strictlynested):
    """The multi-iteration lax.while_loop program must reproduce the
    per-iteration sweep-pair path exactly."""
    localdims = [4] * 5
    _loop_vs_pair(
        localdims,
        lambda: JaxBatchEvaluator(_fjax_lorentz, localdims),
        seed=21, tolerance=1e-10, strictlynested=strictlynested,
    )


@pytest.mark.slow
def test_optimize_loop_global_pivot_exit():
    """When the in-loop search finds global pivots, the loop exits to the
    host for insertion and re-enters; the whole trajectory (incl. the
    inserted pivots and history bookkeeping) must match the per-iteration
    path. The nasty oscillatory quantics function makes the finder fire
    (5 global pivots in iteration 1)."""
    import jax.numpy as jnp

    n = 10
    w = 2.0 ** -(np.arange(1, n + 1, dtype=np.float64))

    def fj(bits):
        x = jnp.sum(bits.astype(jnp.float64) * jnp.asarray(w))
        return jnp.exp(-10 * x) * jnp.sin(2 * jnp.pi * 100 * x ** 1.1)

    def fpy(bits):
        x = float(np.sum(np.asarray(bits, float) * w))
        return np.exp(-10 * x) * np.sin(2 * np.pi * 100 * x ** 1.1)

    localdims = [2] * n
    fp = tuple(tci.optfirstpivot(fpy, localdims, [1] * n))
    res = _loop_vs_pair(
        localdims, lambda: JaxBatchEvaluator(fj, localdims), seed=1234,
        initialpivots=[fp], tolerance=1e-12, maxbonddim=100, maxiter=100,
        nsearchglobalpivot=10, strictlynested=False,
    )
    t1, r1, e1 = res[0]
    assert e1[-1] < 1e-10
    assert sum(t1.stats["nglobalpivots"]) > 0  # pivots actually fired


@pytest.mark.slow
def test_optimize_loop_capacity_growth():
    """Saturation inside the device loop exits with the saturated
    iteration discarded; the host grows the buffer and re-enters with the
    exact pre-iteration state."""
    from tci_tpu.models.device_sweep import DeviceSweepEngine as DSE

    localdims = [4] * 4
    res = []
    for use_loop in (True, False):
        bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
        bf._device_sweep_engine = DSE(_fjax_lorentz, localdims, imax=2)
        bf._device_sweep_engine.use_optimize_loop = use_loop
        t, r, e = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-12,
            rng=np.random.default_rng(3),
        )
        res.append((t, r, e, bf._device_sweep_engine.Imax))
    (t1, r1, e1, im1), (t2, r2, e2, im2) = res
    assert r1 == r2 and np.allclose(e1, e2)
    assert t1.Iset == t2.Iset and t1.Iset_history == t2.Iset_history
    assert im1 > 2


@pytest.mark.slow
def test_optimize_loop_complex_pair():
    import jax.numpy as jnp

    def gpair(idx):
        v = idx.astype(jnp.float64) + 1.0
        s = jnp.sum(v)
        den = 1.0 + jnp.sum(v * v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    localdims = [3] * 4
    _loop_vs_pair(
        localdims,
        lambda: JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                                  pair_output=True),
        seed=2, tolerance=1e-10, _vt=np.complex128,
    )


@pytest.mark.slow
def test_optimize_loop_scan_chain():
    """The device loop composes with the lax.scan sweep/fill bodies used
    for long chains (L >= 16): full trajectory parity vs the per-iteration
    path on a quantics-length chain."""
    import jax.numpy as jnp

    L = 16
    localdims = [2] * L

    def fj(idx):
        v = idx.astype(jnp.float64)
        wj = 1.0 + 0.3 * jnp.arange(L, dtype=jnp.float64)
        return 1.0 / (1.0 + jnp.sum(v * wj))

    _loop_vs_pair(
        localdims, lambda: JaxBatchEvaluator(fj, localdims),
        seed=9, tolerance=1e-10,
    )


def test_optimize_loop_rook_parity():
    """Rook inside the device loop: seeds are pre-drawn in the pair
    path's per-iteration order, so a single-block run follows the exact
    per-iteration rook trajectory."""
    localdims = [4] * 5  # uniform chain -> scan rook body
    res = []
    for use_loop in (True, False):
        bf = JaxBatchEvaluator(_fjax_lorentz, localdims)
        eng = bf.device_sweep_engine
        eng.use_optimize_loop = use_loop
        eng._rng = np.random.default_rng(7)
        t, r, e = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-10, pivotsearch="rook",
            rng=np.random.default_rng(5),
        )
        res.append((t, r, e, eng.nevals))
    (t1, r1, e1, n1), (t2, r2, e2, n2) = res
    assert r1 == r2
    assert np.allclose(e1, e2)
    assert t1.Iset == t2.Iset
    assert t1.Iset_history == t2.Iset_history
    for a, b in zip(t1.sitetensors(), t2.sitetensors()):
        assert np.allclose(a, b, atol=1e-12)
    assert n1 == n2  # eval accounting matches the per-iteration path


@pytest.mark.slow
def test_fuzz_engine_vs_host_random_configs():
    """Seeded fuzz: random chain shapes/tolerances/knobs, device loop vs
    the host oracle — full tensors must agree and ranks match."""
    import jax.numpy as jnp

    master = np.random.default_rng(20260818)
    for trial in range(6):
        L = int(master.integers(3, 6))
        localdims = [int(master.integers(2, 6)) for _ in range(L)]
        tolerance = float(10.0 ** -master.integers(6, 11))
        maxbonddim = int(master.integers(3, 20))
        strict = bool(master.integers(0, 2))
        c = master.standard_normal(L) * 0.5
        w = 1.0 + master.random(L)
        cj = jnp.asarray(c)
        wj = jnp.asarray(w)

        def fj(idx, cj=cj, wj=wj):
            v = idx.astype(jnp.float64)
            return 1.0 / (
                1.0 + jnp.sum(wj * (v - cj) ** 2)
            ) + 0.1 * jnp.cos(jnp.sum(v * wj))

        def fpy(x, c=c, w=w):
            v = np.asarray(x, float)
            return float(
                1.0 / (1.0 + np.sum(w * (v - c) ** 2))
                + 0.1 * np.cos(np.sum(v * w))
            )

        bf = JaxBatchEvaluator(fj, localdims)
        t1, r1, e1 = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=tolerance,
            maxbonddim=maxbonddim, strictlynested=strict,
            rng=np.random.default_rng(trial),
        )
        t2, r2, e2 = tci.crossinterpolate2(
            np.float64, fpy, localdims, tolerance=tolerance,
            maxbonddim=maxbonddim, strictlynested=strict,
            rng=np.random.default_rng(trial),
        )
        cfg = (localdims, tolerance, maxbonddim, strict)
        assert t1.linkdims() == t2.linkdims(), cfg
        ft1 = tci.fulltensor(tci.tensortrain(t1))
        ft2 = tci.fulltensor(tci.tensortrain(t2))
        assert np.allclose(ft1, ft2, atol=1e-8), cfg


@pytest.mark.slow
def test_whole_sweep_rook_complex_pair():
    """pivotsearch='rook' with a pair-valued (complex) evaluator runs the
    pair-capable SCAN rook body (the only rook variant with (re, im) slab
    kernels) and must converge to the true function with fewer samples
    than full search."""
    import jax.numpy as jnp

    localdims = [4] * 5

    def gpair(idx):
        v = idx.astype(jnp.float64) + 1.0
        s = jnp.sum(v)
        den = 1.0 + jnp.sum(v * v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    def gpy(x):
        v = np.asarray(x, float) + 1.0
        return np.exp(1j * v.sum()) / (1.0 + v @ v)

    bf = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                           pair_output=True)
    assert bf.device_sweep_engine.pair
    t1, r1, e1 = tci.crossinterpolate2(
        np.complex128, bf, localdims, tolerance=1e-9, pivotsearch="rook",
        rng=np.random.default_rng(7),
    )
    assert e1[-1] < 1e-9 and e1[-1] > 0.0
    bf2 = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                            pair_output=True)
    t2, r2, e2 = tci.crossinterpolate2(
        np.complex128, bf2, localdims, tolerance=1e-9, pivotsearch="full",
        rng=np.random.default_rng(7),
    )
    assert t1.rank() == t2.rank()
    # slab sampling must cost fewer evaluations than full panels
    assert bf.device_sweep_engine.nevals < bf2.device_sweep_engine.nevals
    for v in [(0, 0, 0, 0, 0), (1, 2, 3, 0, 1), (3, 2, 1, 2, 3)]:
        assert abs(t1.evaluate(v) - gpy(v)) < 1e-8


def test_optimize_loop_rook_complex_pair():
    """Rook + pair inside the multi-iteration device loop follows the
    exact per-iteration rook trajectory (same pre-drawn slab seeds)."""
    import jax.numpy as jnp

    localdims = [3] * 4

    def gpair(idx):
        v = idx.astype(jnp.float64) + 1.0
        s = jnp.sum(v)
        den = 1.0 + jnp.sum(v * v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    res = []
    for use_loop in (True, False):
        bf = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                               pair_output=True)
        eng = bf.device_sweep_engine
        eng.use_optimize_loop = use_loop
        eng._rng = np.random.default_rng(13)
        t, r, e = tci.crossinterpolate2(
            np.complex128, bf, localdims, tolerance=1e-10,
            pivotsearch="rook", rng=np.random.default_rng(5),
        )
        res.append((t, r, e, eng.nevals))
    (t1, r1, e1, n1), (t2, r2, e2, n2) = res
    assert r1 == r2
    assert np.allclose(e1, e2)
    assert t1.Iset == t2.Iset
    assert t1.Iset_history == t2.Iset_history
    for a, b in zip(t1.sitetensors(), t2.sitetensors()):
        assert np.allclose(a, b, atol=1e-12)
    assert n1 == n2


def test_rook_scan_short_nonuniform_chain():
    """Short NON-uniform chains now route through the scan rook body too
    (the unrolled body and its max_panel_edge_rook compile cliff are
    retired from production). Convergence must match full search."""
    localdims = [4, 3, 5, 4, 2, 3]
    L = len(localdims)

    def fjax(idx):
        import jax.numpy as jnp

        w = 1.0 / (2.0 + jnp.arange(L, dtype=jnp.float64))
        x = jnp.sum(idx.astype(jnp.float64) * w)
        return 1.0 / (1.0 + x * x)

    def fpy(v):
        w = 1.0 / (2.0 + np.arange(L, dtype=float))
        x = float(np.sum(np.asarray(v, float) * w))
        return 1.0 / (1.0 + x * x)

    bf = JaxBatchEvaluator(fjax, localdims)
    t1, r1, e1 = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-10, pivotsearch="rook",
        rng=np.random.default_rng(5),
    )
    assert e1[-1] < 1e-10
    for v in [(0, 0, 0, 0, 0, 0), (3, 2, 4, 3, 1, 2), (1, 1, 2, 0, 1, 0)]:
        assert abs(t1.evaluate(v) - fpy(v)) < 1e-8
