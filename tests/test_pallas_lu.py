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
        assert np.allclose(
            r.astype(np.float64), o.astype(np.float64), atol=1e-5,
            equal_nan=True,
        ), n


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
