"""Probe: scan sweep/fill bodies on the config-1 workload (d=10, L=8,
real f64) — warm-wall parity gate for flipping the scan_min_L default.

The scan bodies won the cold-compile war (probe_scan_bodies: config-5
cold 58.8 s vs 186.4 s; d=15 L=10 pair clean at 107.9 s vs 1252 s
unrolled — the old "kernel fault" gate note is refuted). The remaining
question is the HEADLINE config's warm wall: config 1 is dispatch-bound
(0.22-0.25 s) and the unrolled bodies' exact per-bond shapes were the
stated runtime argument. This probe runs config 1 with scan_min_L as
given (default 0) and prints cold + median-of-3 warm + rank/error for
comparison against the canonical unrolled numbers.

    python benchmarks/probe_scan_config1.py [scan_min_L]
"""

import json
import sys
import tempfile
import time


def main():
    from _common import setup_cache  # noqa: F401  (sys.path only)
    import jax

    scan_min_l = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    jax.config.update("jax_compilation_cache_dir",
                      tempfile.mkdtemp(prefix="tci_probe_cache_"))

    import jax.numpy as jnp
    import numpy as np

    import tci_tpu as tci
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator

    float(jnp.sum(jnp.ones((8, 8))))  # chip grant

    localdims = [10] * 8

    def fjax(idx):
        v = idx.astype(jnp.float64) + 1.0
        return 1.0 / (1.0 + jnp.sum(v * v))

    bf = JaxBatchEvaluator(fjax, localdims, dtype=np.float64)
    bf.device_sweep_engine.scan_min_L = scan_min_l

    t0 = time.perf_counter()
    tci.crossinterpolate2(np.float64, bf, localdims, tolerance=1e-8)
    cold = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        t, ranks, errors = tci.crossinterpolate2(
            np.float64, bf, localdims, tolerance=1e-8)
        walls.append(time.perf_counter() - t0)
    print(json.dumps({
        "scan_min_L": scan_min_l,
        "cold_wall_s": round(cold, 1),
        "warm_wall_s_median": round(float(np.median(walls)), 3),
        "warm_walls": [round(w, 3) for w in walls],
        "rank": int(t.rank()),
        "final_error": float(errors[-1]),
    }))


if __name__ == "__main__":
    import os
    import threading

    main()
    sys.stdout.flush()
    threading.Timer(30.0, lambda: os._exit(0)).start()
    try:
        import jax

        jax.extend.backend.clear_backends()
    except Exception:
        pass
    os._exit(0)
