"""BASELINE config 4: 10-D TT integration via GK quadrature
(test_integration.jl:29-38 as a benchmark)."""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    import tci_tpu as tci

    def fjax(x):
        return 1000 * jnp.cos(10 * jnp.sum(x**2)) * jnp.exp(
            -jnp.sum(x) ** 4 / 1000
        )

    t0 = time.perf_counter()
    # per-bond fused tier: panels sized to actual rank (the padded
    # whole-sweep programs exceed HBM for d=15 at high rank)
    I15 = tci.integrate(
        np.float64, fjax, [-1.0] * 10, [1.0] * 10, GKorder=15,
        tolerance=1e-8, jax_native=True, maxbonddim=128,
        enable_device_sweep=False,
    )
    wall = time.perf_counter() - t0
    Iref = -5.4960415218049
    print(
        json.dumps(
            {
                "metric": "integration_10d_walltime",
                "value": round(wall, 3),
                "unit": "s",
                "vs_baseline": None,
                "detail": {
                    "integral": float(I15),
                    "abs_err_vs_reference": abs(I15 - Iref),
                },
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _common import finish, setup_cache

    setup_cache()
    main()
    finish()
