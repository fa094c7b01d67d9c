"""Probe: scan sweep/fill bodies for SHORT chains — compile wall vs results.

Config-5's 186 s cold wall is dominated by jit(loop) (~130 s): for L<16
the loop body embeds TWO UNROLLED 2-site sweeps + an unrolled fill. The
scan bodies compile flat in L (the rook sweep is scan-only for exactly
this reason), but an old gate note claims the scan body "triggered TPU
kernel faults for large odd local dims (d=15, L=10)" — a note from an
older architecture that (like the round-1 edge-2048 fault) must be
RE-PROBED, not trusted.

This probe runs the config-5 workload (d=15, L=6, complex pair, global
search) with engine.scan_min_L=0 (scan bodies) on the real chip, with a
fresh compile cache + jax_log_compiles, and prints compile attribution,
cold/warm walls, rank, error and the integral — to be compared against
the unrolled canonical numbers (STATUS: rank 13, err 4.7e-8). Pass a
second arg "10" to probe the d=15 L=10 shape of the original fault note.

    python benchmarks/probe_scan_bodies.py [scan_min_L] [L]
"""

import json
import logging
import re
import sys
import tempfile
import time
from collections import defaultdict

_FIN = re.compile(r"Finished XLA compilation of (.+?) in ([0-9.eE+-]+) sec")


class _Cap(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.events = []

    def emit(self, record):
        m = _FIN.search(record.getMessage())
        if m:
            self.events.append((m.group(1), float(m.group(2))))


def main():
    from _common import setup_cache  # noqa: F401  (sys.path only)
    import jax

    scan_min_l = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    jax.config.update("jax_compilation_cache_dir",
                      tempfile.mkdtemp(prefix="tci_probe_cache_"))
    jax.config.update("jax_log_compiles", True)
    cap = _Cap()
    logging.getLogger("jax").addHandler(cap)
    logging.getLogger("jax").setLevel(logging.DEBUG)

    import jax.numpy as jnp
    import numpy as np

    import tci_tpu as tci
    from tci_tpu.ops.kronrod import kronrod
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator

    float(jnp.sum(jnp.ones((8, 8))))  # chip grant outside the timed region

    GKorder, tol = 15, 1e-7
    nodes1d, weights1d, _ = kronrod(GKorder // 2)
    nodes = jnp.asarray((nodes1d + 1) / 2)
    weights = jnp.asarray(weights1d / 2)
    normalization = float(GKorder) ** L

    def fpair(idx):
        t = nodes[idx]
        w = jnp.prod(weights[idx])
        s = 10.0 * jnp.sum(t)
        damp = jnp.exp(-jnp.sum((t[:, None] - t[None, :]) ** 2))
        amp = w * damp * normalization
        return jnp.stack([amp * jnp.cos(s), amp * jnp.sin(s)])

    localdims = [len(nodes1d)] * L
    bf = JaxBatchEvaluator(fpair, localdims, dtype=np.complex128,
                           pair_output=True)
    bf.device_sweep_engine.scan_min_L = scan_min_l

    t0 = time.perf_counter()
    tci.crossinterpolate2(np.complex128, bf, localdims, tolerance=tol,
                          nsearchglobalpivot=10)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    t, ranks, errors = tci.crossinterpolate2(
        np.complex128, bf, localdims, tolerance=tol, nsearchglobalpivot=10)
    warm = time.perf_counter() - t0
    integral = t.sum() / normalization

    agg = defaultdict(lambda: [0, 0.0])
    for name, secs in cap.events:
        key = re.sub(r"[0-9]+", "#", name)
        agg[key][0] += 1
        agg[key][1] += secs
    top = sorted(({"name": k, "count": c, "total_s": round(s, 2)}
                  for k, (c, s) in agg.items()),
                 key=lambda r: -r["total_s"])[:8]
    print(json.dumps({
        "scan_min_L": scan_min_l, "L": L,
        "cold_wall_s": round(cold, 1), "warm_wall_s": round(warm, 3),
        "rank": int(t.rank()), "final_error": float(errors[-1]),
        "integral_re": float(np.real(integral)),
        "integral_im": float(np.imag(integral)),
        "compile_s_total": round(sum(s for _, s in cap.events), 1),
        "top": top,
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
