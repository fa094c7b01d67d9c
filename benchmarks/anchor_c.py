"""Compiled scalar-sampling anchor for the config-1 baseline.

The Julia reference cannot run in this image (no julia binary, zero
egress), so BASELINE.md's config-1 proxy was a *Python* scalar loop with a
guessed 5-20x "Julia is faster per call" band. This module replaces the
guess with a MEASUREMENT: it compiles (at run time, gcc -O3) a C
implementation of the reference's scalar sampling path — the
`_batchevaluate_dispatch` triple loop assembling [i..., c, j...] indices
and evaluating the 8-D Lorentzian f(v) = 1/(1 + v·v) per sample
(reference: src/batcheval.jl:131-175 driving README.md:21-29's f) — and
measures evals/second on this host. Two variants bracket what a compiled
single-node reference can sustain:

- ``inline``: f inlined into the loop, index decode in registers. This is
  the speed-of-light for any compiled language; real Julia with a user
  closure cannot beat it.
- ``fptr``: f called per sample through an opaque function pointer taking
  an index vector (noinline) — the reference's f is a black-box user
  closure called per multi-index, so this models the per-call dispatch +
  index-vector assembly a real run pays.

The true Julia rate lies between the two (closer to fptr for black-box
integrands, which is what TCI is FOR); both are reported so the anchored
multiple is a measured bracket, not a guess.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import time

_C_SRC = r"""
#include <stdint.h>

typedef double (*fptr_t)(const int32_t *idx);

static double lorentz8(const int32_t *idx) {
    double s = 0.0;
    for (int k = 0; k < 8; ++k) {
        double v = (double)idx[k] + 1.0;
        s += v * v;
    }
    return 1.0 / (1.0 + s);
}

/* exported so the fptr variant calls through a real indirect call */
__attribute__((noinline)) double lorentz8_entry(const int32_t *idx) {
    return lorentz8(idx);
}

/* Expensive integrand: same Lorentzian modulated by a 16-term sine
   series — the cost profile of a physics integrand (config-5 style),
   where per-sample work is real. Must match bench.py's jax version
   term for term. */
static double lorentz8_exp(const int32_t *idx) {
    double s = 0.0;
    for (int k = 0; k < 8; ++k) {
        double v = (double)idx[k] + 1.0;
        s += v * v;
    }
    double w = 0.0;
    for (int k = 1; k <= 16; ++k) {
        w += __builtin_sin(s * (double)k / 16.0 + (double)k)
             / ((double)k + 1.0);
    }
    return (1.0 + 0.1 * w) / (1.0 + s);
}

double sample_inline_exp(const int32_t *Iset, int64_t nI, int64_t len_l,
                         const int32_t *Jset, int64_t nJ, int64_t len_r,
                         int64_t d) {
    double acc = 0.0;
    int32_t idx[8];
    for (int64_t a = 0; a < nI; ++a) {
        for (int64_t k = 0; k < len_l; ++k) idx[k] = Iset[a * len_l + k];
        for (int64_t c = 0; c < d; ++c) {
            idx[len_l] = (int32_t)c;
            for (int64_t b = 0; b < nJ; ++b) {
                for (int64_t k = 0; k < len_r; ++k)
                    idx[len_l + 1 + k] = Jset[b * len_r + k];
                acc += lorentz8_exp(idx);
            }
        }
    }
    return acc;
}

/* Reference scalar sampling loop (batcheval.jl:131-175): for every
   (left, center, right) triple, assemble the multi-index and evaluate f.
   nI x d x nJ samples; left indices are len_l ints, right are len_r. */
double sample_inline(const int32_t *Iset, int64_t nI, int64_t len_l,
                     const int32_t *Jset, int64_t nJ, int64_t len_r,
                     int64_t d) {
    double acc = 0.0;
    int32_t idx[8];
    for (int64_t a = 0; a < nI; ++a) {
        for (int64_t k = 0; k < len_l; ++k) idx[k] = Iset[a * len_l + k];
        for (int64_t c = 0; c < d; ++c) {
            idx[len_l] = (int32_t)c;
            for (int64_t b = 0; b < nJ; ++b) {
                for (int64_t k = 0; k < len_r; ++k)
                    idx[len_l + 1 + k] = Jset[b * len_r + k];
                acc += lorentz8(idx);
            }
        }
    }
    return acc;
}

/* Parametric-cost integrand: the same Lorentzian modulated by an
   nterms-term sine series. nterms is a RUNTIME loop bound so one build
   sweeps the whole per-sample-cost axis (the crossover study); gcc -O3
   still keeps the inner loop in registers, and each term pays a real
   libm sin() call — the honest scalar cost of a physics integrand. */
static double lorentz8_exp_t(const int32_t *idx, int64_t nterms) {
    double s = 0.0;
    for (int k = 0; k < 8; ++k) {
        double v = (double)idx[k] + 1.0;
        s += v * v;
    }
    double w = 0.0;
    for (int64_t k = 1; k <= nterms; ++k) {
        w += __builtin_sin(s * (double)k / (double)nterms + (double)k)
             / ((double)k + 1.0);
    }
    return (1.0 + 0.1 * w) / (1.0 + s);
}

double sample_inline_exp_t(const int32_t *Iset, int64_t nI, int64_t len_l,
                           const int32_t *Jset, int64_t nJ, int64_t len_r,
                           int64_t d, int64_t nterms) {
    double acc = 0.0;
    int32_t idx[8];
    for (int64_t a = 0; a < nI; ++a) {
        for (int64_t k = 0; k < len_l; ++k) idx[k] = Iset[a * len_l + k];
        for (int64_t c = 0; c < d; ++c) {
            idx[len_l] = (int32_t)c;
            for (int64_t b = 0; b < nJ; ++b) {
                for (int64_t k = 0; k < len_r; ++k)
                    idx[len_l + 1 + k] = Jset[b * len_r + k];
                acc += lorentz8_exp_t(idx, nterms);
            }
        }
    }
    return acc;
}

double sample_fptr(const int32_t *Iset, int64_t nI, int64_t len_l,
                   const int32_t *Jset, int64_t nJ, int64_t len_r,
                   int64_t d, fptr_t f) {
    double acc = 0.0;
    int32_t idx[8];
    for (int64_t a = 0; a < nI; ++a) {
        for (int64_t k = 0; k < len_l; ++k) idx[k] = Iset[a * len_l + k];
        for (int64_t c = 0; c < d; ++c) {
            idx[len_l] = (int32_t)c;
            for (int64_t b = 0; b < nJ; ++b) {
                for (int64_t k = 0; k < len_r; ++k)
                    idx[len_l + 1 + k] = Jset[b * len_r + k];
                acc += f(idx);
            }
        }
    }
    return acc;
}
"""

_LIB = None


def _build():
    global _LIB
    if _LIB is not None:
        return _LIB
    d = tempfile.mkdtemp(prefix="tci_anchor_")
    src = os.path.join(d, "anchor.c")
    so = os.path.join(d, "anchor.so")
    with open(src, "w") as fh:
        fh.write(_C_SRC)
    subprocess.run(
        ["gcc", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so,
         "-lm"],
        check=True, capture_output=True,
    )
    lib = ctypes.CDLL(so)
    i32p = ctypes.POINTER(ctypes.c_int32)
    for name in ("sample_inline", "sample_fptr", "sample_inline_exp",
                 "sample_inline_exp_t"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_double
        fn.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ] + ([ctypes.c_void_p] if name == "sample_fptr" else []) + (
            [ctypes.c_int64] if name == "sample_inline_exp_t" else [])
    _LIB = lib
    return lib


def measure_expensive_t(nterms: int, n_target: int = 2_000_000,
                        reps: int = 3):
    """Compiled-scalar evals/s for the nterms-term expensive integrand
    (crossover study's C side; same panel shape as measure())."""
    import numpy as np

    lib = _build()
    nI, nJ, dd = 40, 50, 10
    Iset = np.ascontiguousarray(
        np.array([[i % 10, (i // 10) % 10, i % 7] for i in range(nI)],
                 dtype=np.int32))
    Jset = np.ascontiguousarray(
        np.array([[i % 10, i % 3, i % 5, i % 2] for i in range(nJ)],
                 dtype=np.int32))
    per_call = nI * dd * nJ
    # scale the loop count down as the integrand gets pricier, bounded
    # below so timing noise stays small
    loops = max(1, min(n_target // per_call,
                       int(64_000_000 / (per_call * max(nterms, 1)))))
    i32p = ctypes.POINTER(ctypes.c_int32)
    args = (Iset.ctypes.data_as(i32p), nI, 3,
            Jset.ctypes.data_as(i32p), nJ, 4, dd, nterms)
    lib.sample_inline_exp_t(*args)  # warm-up
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(loops):
            acc += lib.sample_inline_exp_t(*args)
        dt = time.perf_counter() - t0
        assert acc != 0.0
        rates.append(loops * per_call / dt)
    return float(np.median(rates))


def measure(n_target: int = 4_000_000, reps: int = 3):
    """Measure both compiled sampling rates (evals/s) on this host.

    Builds index sets shaped like a config-1 mid-optimization Π panel
    (len_l=3, center d=10, len_r=4) and loops them to ~n_target samples
    per rep. Returns {"inline": rate, "fptr": rate}.
    """
    import numpy as np

    lib = _build()
    nI, nJ, dd = 40, 50, 10
    Iset = np.ascontiguousarray(
        np.array([[i % 10, (i // 10) % 10, i % 7] for i in range(nI)],
                 dtype=np.int32))
    Jset = np.ascontiguousarray(
        np.array([[i % 10, i % 3, i % 5, i % 2] for i in range(nJ)],
                 dtype=np.int32))
    per_call = nI * dd * nJ
    loops = max(1, n_target // per_call)
    i32p = ctypes.POINTER(ctypes.c_int32)
    ip = Iset.ctypes.data_as(i32p)
    jp = Jset.ctypes.data_as(i32p)
    fp = ctypes.cast(lib.lorentz8_entry, ctypes.c_void_p)
    out = {}
    fns = {"inline": lib.sample_inline, "fptr": lib.sample_fptr,
           "inline_expensive_f": lib.sample_inline_exp}
    for name, fn in fns.items():
        args = (ip, nI, 3, jp, nJ, 4, dd) + (
            (fp,) if name == "fptr" else ())
        fn(*args)  # warm-up (page-in, branch predictors)
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(loops):
                acc += fn(*args)
            dt = time.perf_counter() - t0
            assert acc != 0.0
            rates.append(loops * per_call / dt)
        out[name] = float(np.median(rates))
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(measure()))
