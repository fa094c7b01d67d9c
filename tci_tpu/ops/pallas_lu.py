"""Pallas TPU kernel: VMEM-resident complete-pivot rank-revealing LU.

TCI's Π panels are small enough to fit in VMEM (≲ 1024² f32 / 724² f64 within
the ~16 MB/core budget). The XLA while-loop kernel (lu_kernel.py) round-trips
the panel through HBM on every rank-1 step; this kernel instead keeps the
panel in VMEM for the *entire* elimination: HBM traffic is one panel read and
one write, and each pivot step is a VPU argmax + a VPU rank-1 update straight
out of VMEM.

Grid: single program; the pivot loop is a lax.while_loop mutating the VMEM
ref in place. Permutations, pivot magnitudes and counters live in SMEM/VMEM
outputs. Semantics identical to lu_kernel._rrlu_state (stop rule
matrixlu.jl:363, first-max-in-column-major tie break).

Status: TPU Mosaic has no f64 vector support, so on hardware this kernel is
an f32-only fast path; TCI's tolerance semantics need f64, so nothing in the
TCI sweep machinery dispatches here. `pallas_rrlu_call` is the entry point
for explicitly-f32 panels (same contract as lu_kernel._rrlu_while); it is
NOT auto-dispatched from `rrlu_raw`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/Mosaic; import lazily-guarded for safety
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _abs2(x):
    if jnp.iscomplexobj(x):
        return (x * jnp.conj(x)).real
    return x * x


def _rrlu_kernel(scalars_ref, A_ref, rowperm_ref, colperm_ref, mags_ref,
                 out_scalars_ref, *, leftorthogonal: bool):
    """scalars: [m_true, n_true, maxrank] int32 in SMEM; tolerances arrive via
    mags_ref[-2:] hack-free: we pass them in a separate f64 SMEM ref? No —
    fold them into scalars as bit patterns is ugly; instead tolerances are in
    out_scalars on entry. See pallas_rrlu_call for the calling convention:
    out_scalars_ref[0] = reltol, [1] = abstol on input (input_output_aliased),
    and on exit [0] = npivot, [1] = residual err.
    """
    mp, npd = A_ref.shape
    rmax = mags_ref.shape[0]

    m_true = scalars_ref[0]
    n_true = scalars_ref[1]
    maxrank = scalars_ref[2]
    reltol = out_scalars_ref[0]
    abstol = out_scalars_ref[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (npd, 1), 0)[:, 0]

    # init permutations
    rowperm_ref[:] = rows
    colperm_ref[:] = cols
    mags_ref[:] = jnp.zeros((rmax,), dtype=mags_ref.dtype)

    def cond(state):
        k, maxerror, err, done = state
        return (k < maxrank) & (~done)

    def body(state):
        k, maxerror, err, done = state
        A = A_ref[:]
        valid = (
            (rows[:, None] >= k)
            & (rows[:, None] < m_true)
            & (cols[None, :] >= k)
            & (cols[None, :] < n_true)
        )
        metric = jnp.where(valid, _abs2(A), -1.0)
        flat = metric.T.reshape(-1)
        p = jnp.argmax(flat)
        pc = (p // mp).astype(jnp.int32)
        pr = (p % mp).astype(jnp.int32)
        newerr = jnp.sqrt(jnp.maximum(metric[pr, pc], 0.0))

        stop = ((newerr < reltol * maxerror) | (newerr < abstol)) & (k > 0)
        # exactly-zero pivot => exactly-zero remainder; stop instead of
        # dividing by zero (matches lu_kernel._rrlu_state_small)
        stop = stop | ((newerr == 0.0) & (k > 0))
        do = ~stop
        pr_eff = jnp.where(do, pr, k)
        pc_eff = jnp.where(do, pc, k)

        # swap rows k <-> pr_eff (VMEM in-place)
        rk = A_ref[k, :]
        rp = A_ref[pr_eff, :]
        A_ref[pr_eff, :] = rk
        A_ref[k, :] = rp
        # permutation swaps as vector selects (dynamic scalar stores into
        # VMEM vectors don't lower on hardware)
        rperm = rowperm_ref[:]
        tk = rperm[k]
        tp = rperm[pr_eff]
        rowperm_ref[:] = jnp.where(
            rows == pr_eff, tk, jnp.where(rows == k, tp, rperm)
        )
        # swap cols
        ck = A_ref[:, k]
        cp = A_ref[:, pc_eff]
        A_ref[:, pc_eff] = ck
        A_ref[:, k] = cp
        cperm = colperm_ref[:]
        qk = cperm[k]
        qp = cperm[pc_eff]
        colperm_ref[:] = jnp.where(
            cols == pc_eff, qk, jnp.where(cols == k, qp, cperm)
        )

        Akk = A_ref[k, k]
        safe = jnp.where(do & (Akk != 0), Akk, 1)
        if leftorthogonal:
            colk = A_ref[:, k]
            colk = jnp.where((rows > k) & do, colk / safe, colk)
            A_ref[:, k] = colk
            x = jnp.where((rows > k) & do, colk, 0)
            y = jnp.where(cols > k, A_ref[k, :], 0)
        else:
            rowk = A_ref[k, :]
            rowk = jnp.where((cols > k) & do, rowk / safe, rowk)
            A_ref[k, :] = rowk
            x = jnp.where((rows > k) & do, A_ref[:, k], 0)
            y = jnp.where(cols > k, rowk, 0)
        A_ref[:] = A_ref[:] - x[:, None] * y[None, :]

        magvec = mags_ref[:]
        mags_ref[:] = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (rmax, 1), 0)[:, 0] == k)
            & do,
            newerr,
            magvec,
        )
        return (
            k + do.astype(jnp.int32),
            jnp.where(do, jnp.maximum(maxerror, newerr), maxerror),
            newerr,
            stop,
        )

    ftype = out_scalars_ref.dtype
    k, maxerror, err, done = jax.lax.while_loop(
        cond, body,
        (
            jnp.int32(0),
            jnp.zeros((), ftype),
            jnp.full((), jnp.nan, ftype),
            False,
        ),
    )
    out_scalars_ref[0] = k.astype(out_scalars_ref.dtype)
    out_scalars_ref[1] = err


@functools.partial(jax.jit, static_argnames=("leftorthogonal", "interpret"))
def pallas_rrlu_call(A, m_true, n_true, maxrank, reltol, abstol,
                     *, leftorthogonal: bool, interpret: bool = False):
    """Invoke the VMEM-resident kernel; same contract as _rrlu_while.

    Note: TPU Mosaic has no f64 vector support — on hardware this kernel is
    the f32 fast path; f64 panels go through the XLA while-loop kernel.
    `interpret=True` runs the Pallas interpreter (any platform/dtype) for
    semantics validation.
    """
    mp, npd = A.shape
    rmax = min(mp, npd)
    ftype = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    scalars = jnp.stack(
        [m_true.astype(jnp.int32), n_true.astype(jnp.int32),
         maxrank.astype(jnp.int32)]
    )
    tol_io = jnp.stack([reltol.astype(ftype), abstol.astype(ftype)])

    out_shapes = (
        jax.ShapeDtypeStruct((mp, npd), A.dtype),       # A (aliased in/out)
        jax.ShapeDtypeStruct((mp,), jnp.int32),          # rowperm
        jax.ShapeDtypeStruct((npd,), jnp.int32),         # colperm
        jax.ShapeDtypeStruct((rmax,), ftype),            # mags
        jax.ShapeDtypeStruct((2,), ftype),               # [npivot, err]
    )

    def wrapper(scalars_ref, A_in_ref, tol_in_ref, A_out_ref, rowperm_ref,
                colperm_ref, mags_ref, outsc_ref):
        # A_in/A_out and tol_in/outsc are aliased buffers; operate on outs
        _rrlu_kernel(
            scalars_ref, A_out_ref, rowperm_ref, colperm_ref, mags_ref,
            outsc_ref, leftorthogonal=leftorthogonal,
        )

    A_out, rowperm, colperm, mags, out_sc = pl.pallas_call(
        wrapper,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # Vector outputs must live in VMEM on hardware ("Can only store
            # scalars to SMEM" — Mosaic); only the 2-scalar npivot/err
            # output stays in SMEM.
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={1: 0, 2: 4},
        interpret=interpret,
    )(scalars, A, tol_io)

    k = out_sc[0].astype(jnp.int32)
    err = out_sc[1]
    return A_out, rowperm, colperm, k, mags, err
