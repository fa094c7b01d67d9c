"""VMEM-resident Pallas rrLU kernel vs the XLA while-loop kernel
(interpreter mode — hardware compilation is exercised by the TPU benchmarks).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tci_tpu.ops.lu_kernel import _rrlu_while
from tci_tpu.ops.pallas_lu import HAVE_PALLAS, pallas_rrlu_call


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("leftorthogonal", [True, False])
def test_pallas_matches_xla(dtype, leftorthogonal, rng):
    import jax

    A = rng.standard_normal((16, 16)).astype(dtype)
    args = (
        jnp.asarray(A), jnp.int32(12), jnp.int32(14), jnp.int32(10),
        jnp.float64(1e-6), jnp.float64(0.0),
    )
    ref = _rrlu_while(*args, leftorthogonal=leftorthogonal)
    out = pallas_rrlu_call(
        *args, leftorthogonal=leftorthogonal, interpret=True
    )
    names = ["A", "rowperm", "colperm", "k", "mags", "err"]
    for n, r, o in zip(names, ref, out):
        r = np.asarray(r)
        o = np.asarray(o)
        if n == "mags":
            r = r[: len(o)]
        if n == "A":
            # Contract covers the true extents only (rrlu_raw slices to
            # [:m_true, :n_true]); the swap-based XLA kernel updates the
            # padding region while the swap-free Pallas kernel leaves it
            # untouched.
            r = r[:12, :14]
            o = o[:12, :14]
        assert np.allclose(
            r.astype(np.float64), o.astype(np.float64), atol=1e-5,
            equal_nan=True,
        ), n


def test_f32_dispatch_gated_by_edge(rng, monkeypatch):
    """Panels above PALLAS_MAX_EDGE never dispatch to the Pallas kernel,
    even on a TPU backend (Mosaic register allocation fails there)."""
    from tci_tpu.ops import lu_kernel

    monkeypatch.setattr(lu_kernel.jax, "default_backend", lambda: "tpu")
    ok = rng.standard_normal((200, 100)).astype(np.float32)
    too_big = rng.standard_normal((300, 100)).astype(np.float32)
    if HAVE_PALLAS:
        assert lu_kernel._pallas_f32_eligible(ok, 1e-4, 0.0)
    assert not lu_kernel._pallas_f32_eligible(too_big, 1e-4, 0.0)
    # sub-f32-roundoff tolerances must keep the f64 XLA path (the f32
    # elimination cannot resolve them)
    assert not lu_kernel._pallas_f32_eligible(ok, 1e-14, 0.0)
    # non-TPU accelerators must keep the XLA path (Mosaic is TPU-only)
    monkeypatch.setattr(lu_kernel.jax, "default_backend", lambda: "gpu")
    assert not lu_kernel._pallas_f32_eligible(ok, 1e-4, 0.0)


def test_f32_dispatch_gated_off_on_cpu(rng):
    """On the CPU backend rrlu_raw must take the f64 XLA path for f32 input
    (the Pallas fast path is TPU-only) and still factorize correctly."""
    from tci_tpu.ops import lu_kernel

    assert not lu_kernel._pallas_f32_eligible(
        rng.standard_normal((8, 8)).astype(np.float32), 1e-4, 0.0
    )
    A = rng.standard_normal((20, 15)).astype(np.float32)
    LU, rp, cp, k, mags, err = lu_kernel.rrlu_raw(
        A, maxrank=15, reltol=1e-6, abstol=0.0, leftorthogonal=True
    )
    assert k == 15 and LU.shape == (20, 15)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_rrlu_raw_pallas_f32_matches_xla(rng, monkeypatch):
    """The f32 Pallas dispatch target (run in interpret mode here) returns
    the same factorization as the f64 XLA path on an exactly-representable
    f32 panel."""
    import functools

    from tci_tpu.ops import lu_kernel, pallas_lu

    monkeypatch.setattr(
        pallas_lu, "pallas_rrlu_call",
        functools.partial(pallas_rrlu_call, interpret=True),
    )
    A = rng.standard_normal((20, 15)).astype(np.float32)
    pal = lu_kernel._rrlu_raw_pallas_f32(
        A, maxrank=15, reltol=1e-6, abstol=0.0, leftorthogonal=True
    )
    ref = lu_kernel._rrlu_raw_impl(
        A, maxrank=15, reltol=1e-6, abstol=0.0, leftorthogonal=True
    )
    assert pal[3] == ref[3]
    np.testing.assert_array_equal(pal[1], ref[1])
    np.testing.assert_array_equal(pal[2], ref[2])
    np.testing.assert_allclose(pal[0], ref[0], atol=1e-5)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_truncation(rng):
    A = (rng.standard_normal((12, 3)) @ rng.standard_normal((3, 12))).astype(
        np.float32
    )
    out = pallas_rrlu_call(
        jnp.asarray(A), jnp.int32(12), jnp.int32(12), jnp.int32(12),
        jnp.float64(1e-5), jnp.float64(0.0),
        leftorthogonal=True, interpret=True,
    )
    k = int(out[3])
    assert k == 3


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_tiled_rows_match_xla(rng):
    """Panels above one row tile (mp > 256) run the tiled body (ntiles=2
    here); results must match the XLA kernel exactly like the untiled
    path."""
    A = rng.standard_normal((512, 64)).astype(np.float32)
    args = (
        jnp.asarray(A), jnp.int32(500), jnp.int32(60), jnp.int32(24),
        jnp.float64(1e-6), jnp.float64(0.0),
    )
    ref = _rrlu_while(*args, leftorthogonal=True)
    out = pallas_rrlu_call(*args, leftorthogonal=True, interpret=True)
    assert int(ref[3]) == int(out[3])
    np.testing.assert_array_equal(
        np.asarray(ref[1])[:500], np.asarray(out[1])[:500]
    )
    np.testing.assert_array_equal(
        np.asarray(ref[2])[:60], np.asarray(out[2])[:60]
    )
    np.testing.assert_allclose(
        np.asarray(ref[0])[:500, :60].astype(np.float64),
        np.asarray(out[0])[:500, :60].astype(np.float64),
        atol=1e-4,
    )


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("leftorthogonal", [True, False])
def test_pallas_batched_matches_per_panel(rng, leftorthogonal):
    """pallas_rrlu_batched: one grid program per panel, heterogeneous
    per-panel true sizes / rank caps / tolerances; every panel must be
    bit-identical to the single-panel kernel on the same inputs."""
    import jax.numpy as jnp

    from tci_tpu.ops.pallas_lu import pallas_rrlu_batched

    B, m, n = 4, 32, 24
    A = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    mt = jnp.array([32, 30, 32, 17], jnp.int32)
    nt = jnp.array([24, 24, 20, 24], jnp.int32)
    mr = jnp.array([24, 8, 24, 24], jnp.int32)
    rt = jnp.array([0.0, 0.0, 1e-3, 0.0], jnp.float32)
    at = jnp.zeros(4, jnp.float32)
    out_b = pallas_rrlu_batched(
        A, mt, nt, mr, rt, at, leftorthogonal=leftorthogonal,
        interpret=True,
    )
    for i in range(B):
        out_s = pallas_rrlu_call(
            A[i], mt[i], nt[i], mr[i],
            rt[i].astype(jnp.float64), at[i].astype(jnp.float64),
            leftorthogonal=leftorthogonal, interpret=True,
        )
        assert int(out_b[3][i]) == int(out_s[3])
        np.testing.assert_array_equal(
            np.asarray(out_b[0][i]), np.asarray(out_s[0]))
        np.testing.assert_array_equal(
            np.asarray(out_b[1][i]), np.asarray(out_s[1]))
        np.testing.assert_array_equal(
            np.asarray(out_b[2][i]), np.asarray(out_s[2]))
        np.testing.assert_array_equal(
            np.asarray(out_b[4][i]), np.asarray(out_s[4]))
