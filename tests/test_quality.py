"""Static-quality gates (analogue of the reference's Aqua.jl/JET.jl checks,
test/test_with_aqua.jl, test_with_jet.jl): every module compiles, the public
API resolves, and no module leaks syntax/NameError-level breakage."""

import compileall
import importlib
import pathlib
import pkgutil

import tci_tpu


def test_all_modules_import():
    root = pathlib.Path(tci_tpu.__file__).parent
    for modinfo in pkgutil.walk_packages([str(root)], prefix="tci_tpu."):
        importlib.import_module(modinfo.name)


def test_bytecode_compiles():
    root = pathlib.Path(tci_tpu.__file__).parent
    assert compileall.compile_dir(str(root), quiet=2, force=True)


def test_public_api_resolves():
    for name in tci_tpu.__all__:
        assert getattr(tci_tpu, name, None) is not None, name


def test_no_mutable_default_args():
    """Guard against the classic shared-mutable-default bug in the public
    API functions."""
    import inspect

    for name in tci_tpu.__all__:
        obj = getattr(tci_tpu, name)
        if not callable(obj) or isinstance(obj, type):
            continue
        try:
            sig = inspect.signature(obj)
        except (TypeError, ValueError):
            continue
        for p in sig.parameters.values():
            assert not isinstance(p.default, (list, dict, set)), (
                f"{name}.{p.name} has a mutable default"
            )


def test_kernel_lowerings_static():
    """JET-style static gate: trace+lower (never execute) the core device
    programs over the dtype/shape grid that runtime tests rarely hit, so
    shape/dtype regressions in cold paths fail fast."""
    import jax
    import jax.numpy as jnp

    from tci_tpu.ops.lu_kernel import _rrlu_state
    from tci_tpu.ops.fused import ci_factors, make_fused_bond_update
    from tci_tpu.models.jaxeval import tt_evaluate_batched

    def lower(fn, *avals, **kw):
        jax.jit(fn, **kw).lower(*avals)  # abstract trace only

    S = jax.ShapeDtypeStruct
    i32 = jnp.int32
    f64 = jnp.float64

    # rrLU state: both bodies (small <2^16 elems, fused >=), f64 + c128,
    # square/wide/tall panels
    for shape in [(16, 16), (8, 64), (64, 8), (256, 512), (512, 256)]:
        for dt in (jnp.float64, jnp.complex128):
            lower(
                lambda A, m, n, r, rt, at: _rrlu_state(
                    A, m, n, r, rt, at, True
                ),
                S(shape, dt), S((), i32), S((), i32), S((), i32),
                S((), f64), S((), f64),
            )

    # CI factor extraction for dynamic rank, both orthogonality modes
    for lo in (True, False):
        lower(
            lambda A, rp, cp, k: ci_factors(A, rp, cp, k, lo, jnp.float64),
            S((32, 24), f64), S((32,), i32), S((24,), i32), S((), i32),
        )

    # fused bond update lowers for an L=6 traceable integrand
    fused = make_fused_bond_update(
        lambda idx: 1.0 / (1.0 + jnp.sum(idx.astype(jnp.float64) ** 2))
    )
    fused.lower(
        S((32, 3), i32), S((16, 3), i32), S((), i32), S((), i32),
        S((), i32), S((), f64), S((), f64), leftorthogonal=True,
    )

    # batched TT evaluation (serving path) in f32 and f64
    for dt in (jnp.float32, jnp.float64):
        lower(
            tt_evaluate_batched,
            S((12, 8, 4, 8), dt), S((64, 12), i32),
        )


def test_rook_sweep_lowering_static():
    """Static lowering of the whole-sweep rook program (never executed):
    the traced slab-alternation machinery (_make_sweep_rook) must lower for
    both sweep directions so shape regressions in its cond branches and
    while-loop carry fail fast without paying the compile."""
    import jax
    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import _make_sweep_rook

    S = jax.ShapeDtypeStruct
    i32 = jnp.int32
    f64 = jnp.float64
    localdims = (3, 4, 3)
    L = len(localdims)
    Imax = 8
    for forward in (True, False):
        sweep = _make_sweep_rook(
            lambda idx: 1.0 / (1.0 + jnp.sum(idx.astype(jnp.float64) ** 2)),
            localdims, Imax, forward, jnp.float64,
        )
        sweep.lower(
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((), f64), S((), f64), S((), i32), S((), jnp.uint32),
        )


def test_rook_sweep_scan_lowering_static():
    """Static lowering of the SCAN-based whole-sweep rook program
    (_make_sweep_rook_scan): the dynamic-b bond body (candidate assembly,
    pivot continuation, slab while-loop) must lower for both directions."""
    import jax
    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import _make_sweep_rook_scan

    S = jax.ShapeDtypeStruct
    i32 = jnp.int32
    f64 = jnp.float64
    localdims = (3, 3, 3, 3)
    L = len(localdims)
    Imax = 8
    for forward in (True, False):
        sweep = _make_sweep_rook_scan(
            lambda idx: 1.0 / (1.0 + jnp.sum(idx.astype(jnp.float64) ** 2)),
            localdims, Imax, forward, jnp.float64,
        )
        sweep.lower(
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((), f64), S((), f64), S((), i32), S((), jnp.uint32),
        )


def test_optimize_loop_lowering_static():
    """Static lowering of the multi-iteration optimize loop program
    (DeviceSweepEngine._get_optimize_loop): the while_loop carry (padded
    set buffers, history stacks, core stack, search state) must stay
    shape/dtype-consistent for real and pair value modes, with and
    without the fused search."""
    import jax
    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import DeviceSweepEngine

    S = jax.ShapeDtypeStruct
    i32 = jnp.int32
    f64 = jnp.float64
    localdims = (3, 4, 3)
    L = len(localdims)
    Imax = 8

    def fjax(idx):
        return 1.0 / (1.0 + jnp.sum(idx.astype(jnp.float64) ** 2))

    def fpair(idx):
        s = jnp.sum(idx.astype(jnp.float64))
        return jnp.stack([jnp.cos(s), jnp.sin(s)])

    for pair, nsearch, rook in [
        (False, 5, False), (False, 0, False), (True, 5, False),
        (False, 5, True), (True, 5, True),
    ]:
        eng = DeviceSweepEngine(
            fpair if pair else fjax, localdims, imax=Imax, pair=pair,
        )
        loop = eng._get_optimize_loop(True, False, nsearch, 3, rook)
        Kmax = eng.loop_kmax
        loop.lower(
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((L, Imax, L), i32), S((L,), i32),
            S((), f64), S((), f64), S((), i32), S((), i32), S((), i32),
            S((Kmax, max(nsearch, 1), L), i32), S((), f64), S((), f64),
            S((3,), f64), S((3,), i32), S((3,), jnp.bool_), S((), i32),
            S((), i32), S((), i32),
            *((S((Kmax, 2), jnp.uint32),) if rook else ()),
        )


def test_floatingzone_lowering_static():
    """Static lowering of the device floating-zone search program for
    real and pair value modes."""
    import jax
    import jax.numpy as jnp

    from tci_tpu.models.device_sweep import _make_floatingzone

    S = jax.ShapeDtypeStruct
    i32 = jnp.int32
    f64 = jnp.float64
    localdims = (3, 4, 3)
    L, chi, nst = len(localdims), 8, 6

    def fjax(idx):
        return 1.0 / (1.0 + jnp.sum(idx.astype(jnp.float64) ** 2))

    def fpair(idx):
        s = jnp.sum(idx.astype(jnp.float64))
        return jnp.stack([jnp.cos(s), jnp.sin(s)])

    for pair in (False, True):
        fz = _make_floatingzone(
            fpair if pair else fjax, localdims, chi, nst, jnp.float64,
            pair=pair,
        )
        cores = (
            (S((L, chi, 4, chi), f64), S((L, chi, 4, chi), f64))
            if pair else (S((L, chi, 4, chi), f64),)
        )
        fz.lower(S((nst, L), i32), S((), i32), S((), f64), *cores)


def test_compress_device_lowering_static():
    """Static lowering of the whole-chain compression programs (real and
    pair) over 3-leg and 4-leg chains — shape/dtype regressions in the
    two-pass trace fail fast without paying the compile."""
    import jax
    import jax.numpy as jnp

    from tci_tpu.models.compress_device import _two_pass, _two_pass_pair

    S = jax.ShapeDtypeStruct
    f64 = jnp.float64

    shapes3 = [(1, 3, 5), (5, 3, 5), (5, 3, 5), (5, 3, 1)]
    shapes4 = [(1, 2, 3, 4), (4, 2, 3, 4), (4, 2, 3, 1)]
    for shapes in (shapes3, shapes4):
        L = len(shapes)
        jax.jit(
            lambda rt, at, *cs: _two_pass(list(cs), rt, at, 8)
        ).lower(S((), f64), S((), f64), *[S(sh, f64) for sh in shapes])
        jax.jit(
            lambda rt, at, *cs: _two_pass_pair(
                list(cs[:L]), list(cs[L:]), rt, at, 8
            )
        ).lower(
            S((), f64), S((), f64),
            *[S(sh, f64) for sh in shapes], *[S(sh, f64) for sh in shapes],
        )
