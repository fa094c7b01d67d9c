"""Port of test/test_globalsearch.jl (0-based indices; quantics grid from
tci_tpu.utils.quantics instead of QuanticsGrids.jl)."""

import numpy as np

import tci_tpu as tci
from tci_tpu.utils.quantics import DiscretizedGrid


def test_globalsearch():
    R = 16
    grid = DiscretizedGrid(R, 0.0, 1.0)

    fx = lambda x: np.exp(-x) + 1e-3 * np.sin(1000 * x)
    f = lambda bits: fx(grid.quantics_to_origcoord(bits)[0])

    abstol = 1e-4
    localdims = [2] * R
    firstpivots = [tuple([0] * R), tuple([0] + [1] * (R - 1))]
    t, ranks, errors = tci.crossinterpolate2(
        np.float64, f, localdims, firstpivots,
        tolerance=abstol, maxbonddim=1, normalizeerror=False,
    )

    pivoterrors = tci.estimatetrueerror(
        tci.tensortrain(t), f, nsearch=30,
        rng=np.random.default_rng(1240),
    )
    errors = [e for _, e in pivoterrors]
    recomputed = [abs(f(list(p)) - t(list(p))) for p, _ in pivoterrors]
    assert np.allclose(recomputed, errors)
    # sorted descending
    assert all(errors[i] >= errors[i + 1] for i in range(len(errors) - 1))
    # the rank-1 TT leaves sizable true error; search must find it
    assert errors[0] > abstol


import pytest


@pytest.mark.slow
def test_floatingzone_batch_matches_sequential():
    """The lock-step batched floating zone reproduces the sequential
    per-start trajectories exactly (same pivots, same errors) — batching
    only changes how evaluations are dispatched."""
    from tci_tpu.models.globalsearch import _floatingzone, _floatingzone_batch
    from tci_tpu.models.tensortrain import TensorTrain
    from tci_tpu.models.ttcache import TTCache

    rng = np.random.default_rng(0)
    L, d, chi = 8, 3, 4
    cores = [
        rng.standard_normal(
            (1 if l == 0 else chi, d, 1 if l == L - 1 else chi)
        )
        for l in range(L)
    ]
    tt = TensorTrain(cores)
    f = lambda idx: float(
        np.cos(np.sum(np.asarray(idx) ** 2)) + 0.1 * np.sum(idx)
    )
    initps = [
        tuple(int(rng.integers(0, d)) for _ in range(L)) for _ in range(12)
    ]
    cache = TTCache(tt)
    for tol, nsw in [(float("inf"), 2**62), (0.5, 100)]:
        seq = [
            _floatingzone(cache, f, initp=p, earlystoptol=tol, nsweeps=nsw)
            for p in initps
        ]
        bat = _floatingzone_batch(tt, f, initps, earlystoptol=tol, nsweeps=nsw)
        for (p1, e1), (p2, e2) in zip(seq, bat):
            assert p1 == p2
            assert abs(e1 - e2) < 1e-10 * max(1.0, abs(e1))


def test_estimatetrueerror_device_tier():
    """With a device-sweep evaluator the whole floating-zone search runs
    as one device program. The device trajectory is identical to the host
    lock-step search up to float associativity in the TT contraction, so
    we assert semantic equivalence: every returned (pivot, error) pair is
    self-consistent against the host tt, the list is sorted descending,
    and the best point/error match the host search."""
    import jax.numpy as jnp

    import tci_tpu as tci
    from tci_tpu.models.globalsearch import (
        _floatingzone_batch,
        estimatetrueerror,
    )
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator

    def fj(idx):
        v = idx.astype(jnp.float64) + 1.0
        return 1.0 / (1.0 + jnp.sum(v * v)) + 0.05 * jnp.cos(
            2.7 * jnp.prod(v) ** 0.5
        )

    localdims = [4] * 5
    bf = JaxBatchEvaluator(fj, localdims)
    t, _, _ = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-2, maxbonddim=4
    )
    tt = tci.tensortrain(t)
    starts = [
        tuple(int(x) for x in row)
        for row in np.random.default_rng(3).integers(0, 4, (12, 5))
    ]

    dev = estimatetrueerror(tt, bf, initialpoints=starts)
    assert len(dev) > 0
    errs = [e for _, e in dev]
    assert errs == sorted(errs, reverse=True)
    for p, e in dev:
        true_err = abs(
            float(np.asarray(bf.evaluate_many(
                np.asarray([p], dtype=np.int32)
            ))[0]) - complex(tt.evaluate(p)).real
        )
        assert np.isclose(true_err, e, rtol=1e-9, atol=1e-13), (p, e, true_err)

    host = _floatingzone_batch(tt, bf, starts)
    host_best = max(host, key=lambda pe: pe[1])
    assert dev[0][0] == host_best[0]
    assert np.isclose(dev[0][1], host_best[1], rtol=1e-10)


def test_estimatetrueerror_device_tier_complex_pair():
    """Pair-mode engines search complex |f - tt| on device via (re, im)
    core stacks."""
    import jax.numpy as jnp

    import tci_tpu as tci
    from tci_tpu.models.globalsearch import (
        _floatingzone_batch,
        estimatetrueerror,
    )
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator

    def gpair(idx):
        v = idx.astype(jnp.float64) + 1.0
        s = jnp.sum(v)
        den = 1.0 + jnp.sum(v * v)
        return jnp.stack([jnp.cos(s) / den, jnp.sin(s) / den])

    localdims = [3] * 4
    bg = JaxBatchEvaluator(gpair, localdims, dtype=np.complex128,
                           pair_output=True)
    t, _, _ = tci.crossinterpolate2(
        np.complex128, bg, localdims, tolerance=1e-2, maxbonddim=3
    )
    tt = tci.tensortrain(t)
    starts = [
        tuple(int(x) for x in row)
        for row in np.random.default_rng(5).integers(0, 3, (8, 4))
    ]
    dev = estimatetrueerror(tt, bg, initialpoints=starts)
    assert len(dev) > 0
    for p, e in dev:
        fv = complex(np.asarray(bg.evaluate_many(
            np.asarray([p], dtype=np.int32)
        ))[0])
        true_err = abs(fv - complex(tt.evaluate(p)))
        assert np.isclose(true_err, e, rtol=1e-9, atol=1e-13), (p, e, true_err)
    host = _floatingzone_batch(tt, bg, starts)
    host_best = max(host, key=lambda pe: pe[1])
    assert np.isclose(dev[0][1], host_best[1], rtol=1e-10)


def test_floatingzone_declines_complex_tt_on_real_engine():
    """A complex tensor train must not ride a real engine's floatingzone
    program (the core buffer would silently drop the imaginary part);
    the engine declines and estimatetrueerror falls back to the host."""
    import jax.numpy as jnp

    import tci_tpu as tci
    from tci_tpu.models.globalsearch import estimatetrueerror
    from tci_tpu.models.tensortrain import TensorTrain
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator

    def fj(idx):
        return 1.0 / (1.0 + jnp.sum((idx.astype(jnp.float64) + 1.0) ** 2))

    localdims = [3] * 4
    bf = JaxBatchEvaluator(fj, localdims)  # real engine
    t, _, _ = tci.crossinterpolate2(np.float64, bf, localdims,
                                    tolerance=1e-8)
    tt_c = TensorTrain([
        np.asarray(c, dtype=np.complex128) for c in t.sitetensors()
    ])
    assert bf.device_sweep_engine.floatingzone(
        tt_c.sitetensors(), np.zeros((4, 4), dtype=np.int32)
    ) is None
    # public API still answers through the host path
    res = estimatetrueerror(tt_c, bf, nsearch=5,
                            rng=np.random.default_rng(0))
    assert len(res) > 0
