"""Validation of the Gauss-Kronrod rule generator (ops/kronrod.py).

A (2n+1)-point Gauss-Kronrod rule must integrate polynomials exactly up to
degree 3n+1 (and generically NOT beyond) — this uniquely characterizes the
rule together with node symmetry.
"""

import numpy as np
import pytest

from tci_tpu import kronrod


@pytest.mark.parametrize("n", [1, 2, 3, 7, 10, 20])
def test_polynomial_exactness(n):
    x, w, gw = kronrod(n)
    assert len(x) == 2 * n + 1
    assert len(gw) == n
    for deg in range(3 * n + 2):
        exact = 0.0 if deg % 2 == 1 else 2.0 / (deg + 1)
        assert abs(np.sum(w * x**deg) - exact) < 1e-11 * max(1, abs(exact))
    # not exact beyond 3n+1 (next even degree)
    deg = 3 * n + 2 if (3 * n + 2) % 2 == 0 else 3 * n + 3
    assert abs(np.sum(w * x**deg) - 2.0 / (deg + 1)) > 1e-17


def test_symmetry_positivity():
    x, w, _ = kronrod(7)
    assert np.allclose(x, -x[::-1])
    assert np.all(w > 0)
    # published GK15 values
    assert abs(w[7] - 0.209482141084728) < 1e-14
    assert abs(x[0] + 0.991455371120813) < 1e-14
    assert abs(x[1] + 0.949107912342759) < 1e-14  # embedded Gauss node


def test_gauss_weights_embedded():
    _, _, gw = kronrod(7)
    # Gauss-7 weights integrate constants to 2
    assert abs(np.sum(gw) - 2.0) < 1e-14
