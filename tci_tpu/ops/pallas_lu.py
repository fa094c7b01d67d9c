"""Pallas TPU kernel: VMEM-resident complete-pivot rank-revealing LU.

TCI's Π panels are small enough to fit in VMEM (≲ 1024² f32 within the
~16 MB/core guideline; v5e has 128 MB VMEM so the kernel requests a raised
scoped limit). The XLA while-loop kernel (lu_kernel.py) round-trips the panel
through HBM on every rank-1 step; this kernel instead keeps the panel in VMEM
for the *entire* elimination: HBM traffic is one panel read and one write,
and each pivot step is a VPU reduction + a VPU rank-1 update straight out of
VMEM.

Grid: single program; the pivot loop is a lax.while_loop mutating the VMEM
ref in place. The elimination is the SWAP-FREE variant (exactly
lu_kernel._rrlu_state_fused, which matches the reference stop rule
matrixlu.jl:363 and the first-max-in-column-major tie break in the swapped
layout): the panel is never physically permuted; rowpos/colpos position
vectors in VMEM scratch carry the virtual swaps, and the swapped-layout LU
buffer is materialized by one XLA gather after the kernel.

Mosaic constraints that shaped this code (each one was a hardware-compile
failure first):
- no dynamic_slice / scalar-indexed vector loads or stores -> every
  extraction is a one-hot mask + reduction, every scatter a masked select;
- no 64-bit types: bare Python literals inside the kernel trace as weak
  i64/f64 under x64 and the int64->int32 convert recurses -> all literals
  are explicitly typed;
- reduce-to-scalar lowers through a re-traced jnp.sum proxy that drops
  dtype overrides (so jnp.sum(int32) re-promotes to int64) -> integer
  scalar extractions use jnp.min/jnp.max, which preserve dtype;
- vector outputs must live in VMEM ("Can only store scalars to SMEM");
- each jnp op's intermediate is stack-allocated in scoped VMEM -> the
  swap-free body (fewest panel-sized temporaries) + vmem_limit_bytes;
- a 1-D reduce-SUM to scalar crashes the compiler BACKEND
  (tpu_compile_helper exit 1) -> one-hot extractions use reduce-max with
  a -inf fill, which is exact on a one-hot mask;
- a (1,N)&(N,1) bool broadcast-AND of two dynamically-computed masks also
  crashes the backend (the same shape with constant-foldable masks is
  fine) -> 2-D selectors are built as f32 OUTER PRODUCTS of 1-D masks and
  applied arithmetically;
- input_output_aliases is broken on the tunneled backend: the first
  execution is correct, every re-execution reads the PREVIOUS run's
  outputs as its inputs (measured npivot collapse with abstol == previous
  err) -> no aliasing; the kernel copies A_in -> A_out itself.

Status (round-4 decision record, see docs/ARCHITECTURE.md): these kernels
are a hardware-validated ALTERNATIVE, not the production path. TPU Mosaic
has no f64 vector support, so on hardware they are f32-only
(hardware-validated: bit-exact vs the interpret path and the XLA kernels,
stable across repeated executions). Measured 2026-08-19 on the chip:
single 256² panel 26.5 ms vs XLA 28.1 ms (dispatch-floor tie); batched
32×256² grid 82.6 ms vs 27.0 ms for a vmapped XLA while-loop (0.33x) —
vmap parallelizes ACROSS panels inside each pivot step on the single
core, while a grid serializes panels, so batched same-shape elimination
is a vmap regime. Above a padded edge of 256 the Mosaic register
allocator ran out of spill slots in the scoped allocation ("register
allocator spill slots", measured at 512) with fused full-panel op chains;
the body is ROW-TILED (ROW_TILE) to bound the live set. `rrlu_raw`
dispatches EXPLICITLY-f32 panels up to `lu_kernel.PALLAS_MAX_EDGE` here
(TPU backends only, where the kernel ties XLA); everything else takes the
XLA path. `pallas_rrlu_call` / `pallas_rrlu_batched` are the direct entry
points (same contract as lu_kernel._rrlu_while).
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

# Scoped-VMEM request for the kernel (v5e has 128 MB VMEM/core; the default
# scoped limit is 16 MB, which the per-op stack allocations of a masked
# elimination body exceed for panels >= ~256²).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _abs2(x):
    if jnp.iscomplexobj(x):
        return (x * jnp.conj(x)).real
    return x * x


# Max rows per tile of the elimination body (see the tiling comment in
# _rrlu_kernel); module-level so probes/tests can pin a different size.
ROW_TILE = 256


def _pick_row_tile(mp: int) -> int:
    for t in (ROW_TILE, 128, 64, 32, 16, 8):
        if t <= ROW_TILE and mp % t == 0:
            return t
    return mp


class _Row0:
    """Row-0 view of a (1, n) ref, presenting the (n,) ref interface the
    single-panel kernel body was written against. The batched grid carries
    per-panel 1-D outputs as (B, 1, n) arrays blocked to (1, n) per step
    because Mosaic requires the last two block dims to fully cover (or
    tile 8x128) the array dims — a squeezed (None, n) block over (B, n)
    fails that rule."""

    def __init__(self, ref):
        self._ref = ref

    @property
    def shape(self):
        return self._ref.shape[1:]

    @property
    def dtype(self):
        return self._ref.dtype

    def __getitem__(self, idx):
        # full-slice access only: element access like row[3] would silently
        # read/write the whole row — fail loudly instead of misbehaving
        assert idx == slice(None), f"_Row0 supports [:] access only, got {idx!r}"
        return self._ref[0]

    def __setitem__(self, idx, val):
        assert idx == slice(None), f"_Row0 supports [:] access only, got {idx!r}"
        self._ref[0] = val


def _rrlu_kernel(scalars_ref, A_in_ref, tol_ref, A_ref, rowperm_ref,
                 colperm_ref, mags_ref, out_scalars_ref, rowpos_ref,
                 colpos_ref, colmax_ref, rowperm_s=None, colperm_s=None,
                 mags_s=None, *, leftorthogonal: bool,
                 batched: bool = False):
    """Swap-free complete-pivot elimination, fully mask-based.

    scalars (SMEM): [m_true, n_true, maxrank] int32; tol (SMEM):
    [reltol, abstol]. A_in is copied into the A output ref up front — NO
    input/output aliasing: on the tunneled backend an aliased executable
    re-binds its output buffers on re-execution, so the second run reads the
    FIRST run's results as inputs (measured: npivot collapses to 1 with
    abstol == previous err). out_scalars: [0] = npivot, [1] = residual err.
    rowpos/colpos/colmax are VMEM scratch carrying the virtual-swap position
    vectors and the cached per-column maxima (one panel pass per step, like
    _rrlu_state_fused).
    """
    mp, npd = A_ref.shape

    if batched:
        # Per-panel scalars live as FULL (B, k) SMEM arrays (blocked SMEM
        # operands fail Mosaic's block-shape rule) indexed by the grid id;
        # 1-D vector outputs arrive as (1, n) blocks of (B, 1, n) arrays.
        # The while body below mutates 1-D VMEM SCRATCH (the exact ref
        # layout the hardware-validated single-panel kernel uses) and the
        # blocked outputs are written ONCE after the loop: read-modify-
        # write of 2-D blocked refs inside the loop body was implicated in
        # a Mosaic backend crash (tpu_compile_helper exit 1).
        b = pl.program_id(0)
        m_true = scalars_ref[b, 0]
        n_true = scalars_ref[b, 1]
        maxrank = scalars_ref[b, 2]
        reltol = tol_ref[b, 0]
        abstol = tol_ref[b, 1]
        out_rowperm = _Row0(rowperm_ref)
        out_colperm = _Row0(colperm_ref)
        out_mags = _Row0(mags_ref)
        rowperm_ref, colperm_ref, mags_ref = rowperm_s, colperm_s, mags_s
    else:
        m_true = scalars_ref[0]
        n_true = scalars_ref[1]
        maxrank = scalars_ref[2]
        reltol = tol_ref[0]
        abstol = tol_ref[1]
    rmax = mags_ref.shape[0]
    A_ref[:] = A_in_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (npd, 1), 0)[:, 0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rmax, 1), 0)[:, 0]
    BIG = jnp.int32(2**30)
    ineg = jnp.int32(-1)

    ftype = out_scalars_ref.dtype
    fzero = jnp.asarray(0, ftype)
    fone = jnp.asarray(1, ftype)
    fneg1 = jnp.asarray(-1.0, ftype)
    fneginf = jnp.asarray(-jnp.inf, ftype)

    # init permutations / positions / cached column maxima
    rowperm_ref[:] = rows
    colperm_ref[:] = cols
    rowpos_ref[:] = rows
    colpos_ref[:] = cols
    mags_ref[:] = jnp.zeros((rmax,), dtype=mags_ref.dtype)

    # Row tiling for every panel-sized expression: the Mosaic register
    # allocator runs out of spill slots when a fused op chain keeps several
    # (mp, npd) temporaries live (measured at mp = npd = 512); bounding the
    # chain to TR-row tiles with a static unrolled loop keeps the live set
    # ~TR/mp as large. One tile (mp <= 256) reproduces the untiled program.
    TR = _pick_row_tile(mp)
    ntiles = mp // TR
    tiles = [slice(t * TR, (t + 1) * TR) for t in range(ntiles)]

    # init cached per-column maxima (tiled like every panel pass)
    cmax0 = jnp.full((npd,), fneg1, ftype)
    for sl in tiles:
        A0t = A_ref[sl, :]
        cmax0 = jnp.maximum(
            cmax0,
            jnp.max(
                jnp.where((rows[sl] < m_true)[:, None], _abs2(A0t), fneg1),
                axis=0,
            ),
        )
    colmax_ref[:] = cmax0

    def cond(state):
        k, maxerror, err, done = state
        return (k < maxrank) & (~done)

    def body(state):
        k, maxerror, err, done = state
        rowperm = rowperm_ref[:]
        colperm = colperm_ref[:]
        rowpos = rowpos_ref[:]
        colpos = colpos_ref[:]
        colmax = colmax_ref[:]

        # --- pivot column: max cached colmax; ties -> smallest position ----
        validc = (colpos >= k) & (cols < n_true)
        cm = jnp.where(validc, colmax, fneg1)
        M = jnp.max(cm)
        bestcolpos = jnp.min(jnp.where((cm == M) & validc, colpos, BIG))
        # pc = colperm[bestcolpos] (one-hot extraction; perm entries >= 0)
        pc = jnp.max(jnp.where(cols == bestcolpos, colperm, ineg))

        # --- pivot row within column pc: ties -> smallest position ---------
        acol_tiles = [
            jnp.sum(jnp.where((cols == pc)[None, :], A_ref[sl, :], fzero),
                    axis=1)
            for sl in tiles
        ]
        Acol = (jnp.concatenate(acol_tiles) if ntiles > 1
                else acol_tiles[0])
        validr = (rowpos >= k) & (rows < m_true)
        met = jnp.where(validr, _abs2(Acol), fneg1)
        Mr = jnp.max(met)
        bestrowpos = jnp.min(jnp.where((met == Mr) & validr, rowpos, BIG))
        pr = jnp.max(jnp.where(rows == bestrowpos, rowperm, ineg))
        newerr = jnp.sqrt(jnp.maximum(Mr, fzero))

        # no valid line left (true rank < maxrank on an unpadded buffer):
        # never eliminate on an already-pivoted line
        exhausted = (M < fzero) | (Mr < fzero)
        stop = ((newerr < reltol * maxerror) | (newerr < abstol)) & (k > 0)
        # exactly-zero pivot => exactly-zero remainder; stop instead of
        # dividing by zero (matches lu_kernel._rrlu_state_fused)
        stop = stop | exhausted | ((newerr == fzero) & (k > 0))
        do = ~stop

        # --- virtual swaps (identity when stopping) ------------------------
        r_at_k = jnp.max(jnp.where(rowpos == k, rows, ineg))
        c_at_k = jnp.max(jnp.where(colpos == k, cols, ineg))
        brp = jnp.where(do, bestrowpos, k)
        bcp = jnp.where(do, bestcolpos, k)
        pr_eff = jnp.where(do, pr, r_at_k)
        pc_eff = jnp.where(do, pc, c_at_k)
        # rowperm: position brp <- r_at_k, then position k <- pr_eff
        # (k-write wins on a self-swap, matching .at[brp].set().at[k].set())
        rowperm_ref[:] = jnp.where(
            rows == k, pr_eff, jnp.where(rows == brp, r_at_k, rowperm)
        )
        rowpos_ref[:] = jnp.where(
            rows == pr_eff, k, jnp.where(rows == r_at_k, brp, rowpos)
        )
        colperm_ref[:] = jnp.where(
            cols == k, pc_eff, jnp.where(cols == bcp, c_at_k, colperm)
        )
        colpos_ref[:] = jnp.where(
            cols == pc_eff, k, jnp.where(cols == c_at_k, bcp, colpos)
        )
        rowpos = rowpos_ref[:]
        colpos = colpos_ref[:]

        # --- fused Schur update + multiplier store -------------------------
        # One-hot extraction via max-with(-inf) rather than sum: a 1-D
        # reduce-SUM to scalar crashes the Mosaic compiler backend
        # (tpu_compile_helper exit 1, bisected 2026-08-17); reduce-max
        # lowers fine and is exact on a one-hot mask.
        piv = jnp.max(jnp.where(rows == pr_eff, Acol, fneginf))
        safe = jnp.where(do & (piv != fzero), piv, fone)
        urow = (rowpos >= k + 1) & (rows < m_true)
        ucol = (colpos >= k + 1) & (cols < n_true)
        Arow = jnp.zeros((npd,), ftype)
        for sl in tiles:
            Arow = Arow + jnp.sum(
                jnp.where((rows[sl] == pr_eff)[:, None], A_ref[sl, :],
                          fzero),
                axis=0,
            )
        # All 2-D masks below are built as f32 OUTER PRODUCTS of 1-D masks,
        # never as (1,N)&(N,1) bool broadcasts: a broadcast-AND of two
        # dynamically-computed 1-D bool vectors crashes the Mosaic compiler
        # backend (tpu_compile_helper exit 1, bisected 2026-08-17; the same
        # shape with constant-foldable masks compiles fine).
        if leftorthogonal:
            mult = Acol / safe
            udo = (urow & do).astype(ftype)
            x = mult * udo
            y = Arow * ucol.astype(ftype)
            # store multipliers in the pivot column's unpivoted rows
            ohc = (cols == pc_eff).astype(ftype)
            urowf = udo
        else:
            divr = Arow / safe
            udo = (ucol & do).astype(ftype)
            y = divr * udo
            x = Acol * urow.astype(ftype)
            urowf = urow.astype(ftype)
        cmax = jnp.full((npd,), fneg1, ftype)
        for sl in tiles:
            At = A_ref[sl, :]
            xt = x[sl]
            Anew_t = At - xt[:, None] * y[None, :]
            if leftorthogonal:
                sel_t = udo[sl][:, None] * ohc[None, :]
                Anew_t = (Anew_t * (fone - sel_t)
                          + xt[:, None] * ohc[None, :])
            else:
                ohr_t = (rows[sl] == pr_eff).astype(ftype)
                sel_t = ohr_t[:, None] * udo[None, :]
                Anew_t = (Anew_t * (fone - sel_t)
                          + ohr_t[:, None] * y[None, :])
            A_ref[sl, :] = Anew_t
            # masked column maxima, arithmetically (fill = -1 where the
            # row is retired)
            um_t = urowf[sl][:, None]
            cmax = jnp.maximum(
                cmax,
                jnp.max(_abs2(Anew_t) * um_t - (fone - um_t), axis=0),
            )
        colmax_ref[:] = cmax

        mags_ref[:] = jnp.where((ridx == k) & do, newerr, mags_ref[:])
        return (
            k + do.astype(jnp.int32),
            jnp.where(do, jnp.maximum(maxerror, newerr), maxerror),
            newerr,
            stop,
        )

    k, maxerror, err, done = jax.lax.while_loop(
        cond, body,
        (
            jnp.int32(0),
            jnp.zeros((), ftype),
            jnp.full((), jnp.nan, ftype),
            False,
        ),
    )
    if batched:
        out_rowperm[:] = rowperm_ref[:]
        out_colperm[:] = colperm_ref[:]
        out_mags[:] = mags_ref[:]
        out_scalars_ref[b, 0] = k.astype(out_scalars_ref.dtype)
        out_scalars_ref[b, 1] = err
    else:
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
    tol = jnp.stack([reltol.astype(ftype), abstol.astype(ftype)])

    out_shapes = (
        jax.ShapeDtypeStruct((mp, npd), A.dtype),       # A (kernel copies
        #   A_in into this output itself — NO aliasing; see module docstring)
        jax.ShapeDtypeStruct((mp,), jnp.int32),          # rowperm
        jax.ShapeDtypeStruct((npd,), jnp.int32),         # colperm
        jax.ShapeDtypeStruct((rmax,), ftype),            # mags
        jax.ShapeDtypeStruct((2,), ftype),               # [npivot, err]
    )

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
    A_out, rowperm, colperm, mags, out_sc = pl.pallas_call(
        functools.partial(_rrlu_kernel, leftorthogonal=leftorthogonal),
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
        scratch_shapes=[
            pltpu.VMEM((mp,), jnp.int32),    # rowpos
            pltpu.VMEM((npd,), jnp.int32),   # colpos
            pltpu.VMEM((npd,), ftype),       # cached per-column maxima
        ],
        interpret=interpret,
        **kwargs,
    )(scalars, A, tol)

    # The kernel leaves A in the ORIGINAL layout (swap-free elimination);
    # materialize the swapped-layout LU buffer callers consume with one XLA
    # gather — gathers don't lower inside Mosaic, and this costs a single
    # panel pass.
    A_sw = A_out[rowperm, :][:, colperm]
    k = out_sc[0].astype(jnp.int32)
    err = out_sc[1]
    return A_sw, rowperm, colperm, k, mags, err


@functools.partial(jax.jit, static_argnames=("leftorthogonal", "interpret"))
def pallas_rrlu_batched(A, m_true, n_true, maxrank, reltol, abstol,
                        *, leftorthogonal: bool, interpret: bool = False):
    """Batched VMEM-resident rrLU: one grid program per panel.

    The single-panel kernel pays the per-dispatch latency of the link
    (~29 ms over the dev tunnel) per factorization, which is why it only
    ever tied XLA at TCI panel sizes. Batching B same-shape panels into ONE
    pallas_call with ``grid=(B,)`` amortizes that floor across the batch and
    keeps each elimination entirely VMEM-resident, while the XLA
    alternative — a vmapped while-loop — must stream all B panels through
    HBM on EVERY rank-1 step (the batched while body updates the whole
    (B, m, n) buffer each iteration, masked, until the slowest panel
    finishes). Pallas grid programs run back-to-back on the core with the
    next panel's DMA overlapped by the pipeline, so HBM traffic is one
    read + one write per panel total.

    Args: A (B, m, n) f32; m_true/n_true/maxrank (B,) int32 per-panel true
    sizes and rank caps; reltol/abstol (B,) per-panel tolerances. Returns
    per-panel swapped-layout LU buffers, permutations, npivots, pivot
    magnitudes and final errors — the batched analogue of
    ``pallas_rrlu_call`` (same contract as lu_kernel._rrlu_while, stop rule
    matrixlu.jl:363).
    """
    B, mp, npd = A.shape
    rmax = min(mp, npd)
    ftype = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    scalars = jnp.stack(
        [jnp.broadcast_to(m_true, (B,)).astype(jnp.int32),
         jnp.broadcast_to(n_true, (B,)).astype(jnp.int32),
         jnp.broadcast_to(maxrank, (B,)).astype(jnp.int32)],
        axis=1,
    )
    tol = jnp.stack(
        [jnp.broadcast_to(reltol, (B,)).astype(ftype),
         jnp.broadcast_to(abstol, (B,)).astype(ftype)],
        axis=1,
    )

    out_shapes = (
        jax.ShapeDtypeStruct((B, mp, npd), A.dtype),
        # 1-D per-panel outputs ride as (B, 1, n): a (None, n) block over
        # (B, n) fails Mosaic's last-two-block-dims rule, while (None, 1, n)
        # blocks fully cover their trailing array dims. Squeezed on return.
        jax.ShapeDtypeStruct((B, 1, mp), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, npd), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, rmax), ftype),
        jax.ShapeDtypeStruct((B, 2), ftype),
    )

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
    # The (B, m, n) operands are squeezed (`None` leading block entry) so
    # the kernel body sees single-panel panel refs; per-panel scalars stay
    # FULL SMEM arrays indexed by program_id inside the kernel (blocked
    # SMEM operands fail Mosaic's block-shape rule). Every index map —
    # including the otherwise-auto-generated ones of the full SMEM
    # operands — returns EXPLICIT int32 zeros: with jax x64 enabled
    # (tci_tpu enables it globally) bare `0` literals trace as i64 and
    # Mosaic fails to legalize the transform functions'
    # `func.return (i64, i64)` (tpu_compile_helper exit 1, bisected
    # 2026-08-19).
    Z = np.int32(0)
    A_out, rowperm, colperm, mags, out_sc = pl.pallas_call(
        functools.partial(_rrlu_kernel, leftorthogonal=leftorthogonal,
                          batched=True),
        grid=(B,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec((B, 3), lambda b: (Z, Z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, mp, npd), lambda b: (b, Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda b: (Z, Z),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, mp, npd), lambda b: (b, Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, mp), lambda b: (b, Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, npd), lambda b: (b, Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, rmax), lambda b: (b, Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda b: (Z, Z),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((mp,), jnp.int32),
            pltpu.VMEM((npd,), jnp.int32),
            pltpu.VMEM((npd,), ftype),
            # loop-carried perm/mags live in 1-D scratch (see kernel note)
            pltpu.VMEM((mp,), jnp.int32),
            pltpu.VMEM((npd,), jnp.int32),
            pltpu.VMEM((rmax,), ftype),
        ],
        interpret=interpret,
        **kwargs,
    )(scalars, A, tol)

    rowperm = rowperm[:, 0, :]
    colperm = colperm[:, 0, :]
    mags = mags[:, 0, :]
    A_sw = jax.vmap(lambda a, rp, cp: a[rp, :][:, cp])(
        A_out, rowperm, colperm
    )
    k = out_sc[:, 0].astype(jnp.int32)
    err = out_sc[:, 1]
    return A_sw, rowperm, colperm, k, mags, err
