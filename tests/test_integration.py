"""Port of test/test_integration.jl."""

import numpy as np
import pytest

import tci_tpu as tci

COEFFICIENTS = [
    0.23637074801483304, 0.20661524945577847, 0.1850826417895819,
    0.8433788714289417, 0.5801482873508491, 0.20339438932656262,
    0.21593267492457668, 0.8052490409622802, 0.7189346124875339,
    0.9400806688257749, 0.355210845205325, 0.5251561513473092,
    0.6819965273401778, 0.9221987248861162, 0.04166444723413998,
]


def _polynomial(x):
    return sum(c * x**i for i, c in enumerate(COEFFICIENTS))


def _polynomialintegral(x):
    return sum(c * x ** (i + 1) / (i + 1) for i, c in enumerate(COEFFICIENTS))


def test_integrate_polynomials(rng):
    f = lambda xs: float(np.prod([_polynomial(x) for x in xs]))
    N = 5
    exactval = _polynomialintegral(1.0) ** N
    val = tci.integrate(np.float64, f, [0.0] * N, [1.0] * N)
    assert np.isclose(val, exactval)

    a = rng.random(N)
    b = rng.random(N)
    exactval = float(
        np.prod([_polynomialintegral(bi) - _polynomialintegral(ai)
                 for ai, bi in zip(a, b)])
    )
    val = tci.integrate(np.float64, f, list(a), list(b))
    assert np.isclose(val, exactval)


@pytest.mark.slow
def test_integrate_10d():
    def f(x):
        x = np.asarray(x)
        return 1000 * np.cos(10 * np.sum(x**2)) * np.exp(-np.sum(x) ** 4 / 1000)

    I15 = tci.integrate(
        np.float64, f, [-1.0] * 10, [1.0] * 10, GKorder=15, tolerance=1e-8
    )
    Iref = -5.4960415218049
    assert abs(I15 - Iref) < 1e-3


def test_integrate_jax_native():
    """jax_native path samples the weighted integrand on-device."""
    import jax.numpy as jnp
    import tci_tpu as tci

    fjax = lambda x: jnp.prod(x) + 1.0
    N = 3
    val = tci.integrate(np.float64, fjax, [0.0] * N, [1.0] * N,
                        jax_native=True, tolerance=1e-10)
    exact = 0.5**N + 1.0
    assert np.isclose(val, exact)


def test_gk_eval_cache_multislot():
    """Alternating bounds/orders on the SAME integrand must reuse the cached
    evaluator per grid signature: one build per distinct signature, not a
    rebuild on every alternation (the evaluator re-upload trap, round 3)."""
    import jax.numpy as jnp

    from tci_tpu.models import integration as integ
    from tci_tpu.parallel import batcheval

    fjax = lambda x: jnp.prod(x) + 1.0
    N = 2
    builds = []
    orig_init = batcheval.JaxBatchEvaluator.__init__

    def counting_init(self, *args, **kwargs):
        builds.append(1)
        return orig_init(self, *args, **kwargs)

    from unittest import mock

    grids = [([0.0] * N, [1.0] * N), ([0.0] * N, [0.5] * N)]
    vals = {}
    with mock.patch.object(batcheval.JaxBatchEvaluator, "__init__",
                           counting_init):
        for rep in range(2):
            for gi, (a, b) in enumerate(grids):
                vals.setdefault(gi, []).append(
                    integ.integrate(np.float64, fjax, a, b,
                                    jax_native=True, tolerance=1e-10)
                )
    assert len(builds) == len(grids), (
        f"expected one evaluator build per grid signature, got {len(builds)}"
    )
    for gi, (a, b) in enumerate(grids):
        exact = float(np.prod([(bb * bb - aa * aa) / 2
                               for aa, bb in zip(a, b)])) + float(
            np.prod([bb - aa for aa, bb in zip(a, b)]))
        for v in vals[gi]:
            assert np.isclose(v, exact), (gi, v, exact)
