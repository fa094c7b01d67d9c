"""Crossover study: where does batched device sampling beat compiled C?

The round-4 anchor measurement (benchmarks/anchor_c.py) showed that for a
FREE integrand (the config-1 Lorentzian, ~10 flops/sample) a gcc -O3
scalar loop beats any accelerator round trip — so the config-1 headline
was reframed to sample-efficiency. The open half of that story (VERDICT
round 4 item 3) is the claim "batched wins when f is expensive": this
module MEASURES the crossover by sweeping per-sample integrand cost — an
nterms-term sine series, nterms in 16..4096 (~3 flops + 1 sin per term) —
through BOTH sides:

- C side: anchor_c.sample_inline_exp_t, the reference's scalar sampling
  loop (src/batcheval.jl:131-175) with the integrand inlined, gcc -O3
  -march=native. Upper-bounds single-node Julia.
- device side: one Π-panel protocol call f(Iset, Jset, 1) with
  |I|=|J|=1024, d=10 (10.49M samples/dispatch — the exact panel shape
  filltensor drives, tensorci2.jl:848) through JaxBatchEvaluator, f64.
  At >=2048 terms the panel edge halves to 512 (rate-based; per-row wall
  stays bounded and one dispatch is still far above the dispatch floor).

Run standalone with --save-canonical to write the dated sweep to
benchmarks/results/crossover_canonical.json; bench.py embeds that file
alongside its own live 3-4 point confirmation, so the external bench
artifact always carries the full measured curve even when the in-bench
time budget or a slow shared-chip grant truncates the live sweep.

Reports evals/s per side per nterms plus the interpolated nterms at which
the device passes 1x and 10x compiled-inline. Output: one JSON line
(compact table) — safe for bench.py embedding.

Timing per the axon tunnel rules: warm-up dispatch per program, sync by
fetching one scalar (block_until_ready does not synchronize the tunneled
backend).
"""

from __future__ import annotations

import json
import time

import numpy as np

TERMS = (16, 64, 256, 1024, 4096)


def _device_rate(nterms: int, reps: int | None = None):
    import jax.numpy as jnp

    from tci_tpu import JaxBatchEvaluator

    localdims = [10] * 8
    ks = jnp.arange(1, nterms + 1, dtype=jnp.float64)

    def fexp(idx):
        v = idx.astype(jnp.float64) + 1.0
        s = jnp.sum(v * v)
        w = jnp.sum(jnp.sin(s * ks / nterms + ks) / (ks + 1.0))
        return (1.0 + 0.1 * w) / (1.0 + s)

    # Rate-based measurement, so the panel edge can shrink as the
    # integrand gets pricier (keeps per-row wall bounded without changing
    # what is measured — at >=2048 terms one dispatch is still >=5.5e12
    # sin-terms of work, far above the dispatch floor); reps likewise:
    # run-to-run variance is dominated by the shared-chip grant (constant
    # within a run), not rep noise.
    edge = 512 if nterms >= 2048 else 1024
    if reps is None:
        reps = 3 if nterms < 1024 else (2 if nterms < 2048 else 1)
    ev = JaxBatchEvaluator(fexp, localdims, dtype=np.float64)
    Ipanel = [(i % 10, (i // 10) % 10, i % 7) for i in range(edge)]
    Jpanel = [(i % 10, i % 3, i % 5, i % 2) for i in range(edge)]
    nsamples = len(Ipanel) * 10 * len(Jpanel)
    ev(Ipanel, Jpanel, 1)  # warm-up compile + load
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = ev(Ipanel, Jpanel, 1)
        float(np.asarray(out).ravel()[0])
        walls.append(time.perf_counter() - t0)
    return nsamples / float(np.median(walls))


def _interp_crossing(terms, multiples, target: float):
    """nterms at which the device/C multiple first reaches target
    (log-log interpolation between bracketing sweep points)."""
    for i, m in enumerate(multiples):
        if m >= target:
            if i == 0:
                return terms[0]
            t0, t1 = np.log(terms[i - 1]), np.log(terms[i])
            m0, m1 = np.log(multiples[i - 1]), np.log(multiples[i])
            f = (np.log(target) - m0) / (m1 - m0)
            return int(round(np.exp(t0 + f * (t1 - t0))))
    return None


def measure(terms=TERMS, budget_s: float = 600.0):
    import anchor_c

    t_start = time.time()
    rows = []
    # Budget-priority order: the sweep ENDPOINTS bracket both crossings
    # (the 10x point needs the largest term — a round-5 bench run lost it
    # by walking smallest-first into the budget wall), middles only refine
    # the interpolation. Rows are re-sorted by nterms before interpolating.
    terms = list(terms)
    order = ([terms[0], terms[-1]] + terms[1:-1]) if len(terms) > 1 else terms
    for nt in order:
        if time.time() - t_start > budget_s and rows:
            break
        c_rate = anchor_c.measure_expensive_t(nt)
        d_rate = _device_rate(nt)
        rows.append({
            "nterms": nt,
            "compiled_evals_per_sec": round(c_rate, 1),
            "device_evals_per_sec": round(d_rate, 1),
            "multiple": round(d_rate / c_rate, 3),
        })
    rows.sort(key=lambda r: r["nterms"])
    ts = [r["nterms"] for r in rows]
    ms = [r["multiple"] for r in rows]
    return {
        "rows": rows,
        "crossover_1x_nterms": _interp_crossing(ts, ms, 1.0),
        "crossover_10x_nterms": _interp_crossing(ts, ms, 10.0),
        "note": (
            "nterms-term sine integrand swept through the C scalar anchor "
            "(gcc -O3, inlined) and the device panel sampler (f64, 10.49M "
            "samples/dispatch). crossover_Nx_nterms = per-sample cost at "
            "which the device panel passes Nx compiled-inline (log-log "
            "interpolated; null = not reached in the sweep)."
        ),
    }


if __name__ == "__main__":
    import sys

    from _common import finish, setup_cache

    setup_cache()
    import jax

    budget = next((float(a.split("=", 1)[1]) for a in sys.argv
                   if a.startswith("--budget=")), 600.0)
    out = measure(budget_s=budget)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))
    if "--save-canonical" in sys.argv:
        import datetime
        import os

        out["measured"] = datetime.date.today().isoformat()
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "crossover_canonical.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"saved canonical sweep -> {path}", file=sys.stderr)
    finish()
