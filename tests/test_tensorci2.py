"""Port of test/test_tensorci2.jl (0-based indices)."""

import itertools

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu import (
    AbstractGlobalPivotFinder,
    TensorCI2,
    convergencecriterion,
    crossinterpolate2,
)
from tci_tpu.models.tensorci2 import kronecker_is, kronecker_sj
from tci_tpu.utils.quantics import DiscretizedGrid


def test_kronecker_util():
    multiset = [tuple(range(5)) for _ in range(5)]
    localdim = 4
    c = kronecker_is(multiset, localdim)
    assert len(c) == 20
    for ci in c:
        assert ci[:5] == tuple(range(5))
        assert ci[5] in range(localdim)
    d = kronecker_sj(localdim, multiset)
    for di in d:
        assert di[0] in range(localdim)
        assert di[1:6] == tuple(range(5))


def test_pivoterrors():
    diags = [1.0, 1e-5, 0.0]
    f = lambda x: diags[x[0]] if x[0] == x[1] else 0.0
    t, ranks, errors = crossinterpolate2(
        np.float64, f, [3, 3], [(0, 0)], tolerance=1e-8
    )
    assert np.allclose(t.pivoterrors, diags)


def test_checkbatchevaluatable():
    f = lambda x: 1.0
    L = 10
    with pytest.raises(ValueError):
        crossinterpolate2(
            np.float64, f, [2] * L, [tuple([0] * L)],
            checkbatchevaluatable=True,
        )


@pytest.mark.parametrize("pivotsearch", ["full", "rook"])
@pytest.mark.parametrize("strictlynested", [False, True])
@pytest.mark.parametrize("nsearchglobalpivot", [0, 10])
def test_trivial_mps_exp(pivotsearch, strictlynested, nsearchglobalpivot):
    if nsearchglobalpivot > 0 and strictlynested:
        pytest.skip("combination skipped in reference too")
    R = 8
    abstol = 1e-4
    grid = DiscretizedGrid(R, 0.0, 1.0)
    fx = lambda x: np.exp(-x)
    f = lambda bits: fx(grid.quantics_to_origcoord(bits)[0])

    localdims = [2] * R
    firstpivots = [tuple([0] * R), tuple([0] + [1] * (R - 1))]
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, firstpivots,
        tolerance=abstol, maxbonddim=1, maxiter=2, loginterval=1,
        verbosity=0, normalizeerror=False,
        nsearchglobalpivot=nsearchglobalpivot, pivotsearch=pivotsearch,
        strictlynested=strictlynested,
        rng=np.random.default_rng(1240),
    )
    assert all(d == 1 for d in t.linkdims())

    tt = tci.tensortrain(t)
    for x in [0.1, 0.3, 0.6, 0.9]:
        m = int(x * 2**R)
        indexset = grid.grididx_to_quantics([m])
        assert abs(t.evaluate(indexset) - f(indexset)) < abstol
        assert abs(tt.evaluate(indexset) - f(indexset)) < abstol


class CustomGlobalPivotFinder(AbstractGlobalPivotFinder):
    def __init__(self, npivots):
        self.npivots = npivots

    def __call__(self, input, f, abstol, verbosity=0, rng=None):
        if rng is None:
            rng = np.random.default_rng()
        L = len(input.localdims)
        return [
            tuple(int(rng.integers(0, input.localdims[p])) for p in range(L))
            for _ in range(self.npivots)
        ]


def test_custom_global_pivot_finder():
    R = 8
    abstol = 1e-4
    grid = DiscretizedGrid(R, 0.0, 1.0)
    f = lambda bits: np.exp(-grid.quantics_to_origcoord(bits)[0])
    localdims = [2] * R
    firstpivots = [tuple([0] * R), tuple([0] + [1] * (R - 1))]
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, firstpivots,
        tolerance=abstol, maxbonddim=1, maxiter=2, loginterval=1,
        verbosity=0, normalizeerror=False,
        globalpivotfinder=CustomGlobalPivotFinder(10),
        rng=np.random.default_rng(1240),
    )
    assert all(d == 1 for d in t.linkdims())
    tt = tci.tensortrain(t)
    for x in [0.1, 0.3, 0.6, 0.9]:
        indexset = grid.grididx_to_quantics([int(x * 2**R)])
        assert abs(t.evaluate(indexset) - f(indexset)) < abstol
        assert abs(tt.evaluate(indexset) - f(indexset)) < abstol


def test_trivial_mps_exp_small_maxbonddim():
    R = 8
    abstol = 1e-10
    grid = DiscretizedGrid(R, 0.0, 1.0)
    fx = lambda x: np.exp(-x) + 1e-4 * np.exp(-2 * x)
    f = lambda bits: fx(grid.quantics_to_origcoord(bits)[0])
    localdims = [2] * R
    firstpivots = [tuple([0] * R), tuple([0] + [1] * (R - 1))]
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, firstpivots,
        tolerance=abstol, maxbonddim=1, maxiter=10, loginterval=1,
        verbosity=0, normalizeerror=False, nsearchglobalpivot=10,
        rng=np.random.default_rng(1240),
    )
    assert all(d == 1 for d in t.linkdims())
    tt = tci.tensortrain(t)
    for x in [0.1, 0.3, 0.6, 0.9]:
        indexset = grid.grididx_to_quantics([int(x * 2**R)])
        assert abs(t.evaluate(indexset) - f(indexset)) < 1e-4
        assert abs(tt.evaluate(indexset) - f(indexset)) < 1e-4


def test_trivial_mps():
    n = 5
    f = lambda v: sum(v) * 0.5

    t = TensorCI2([2] * n)
    assert len(t) == n
    assert t.rank() == 0
    assert t.linkdims() == [0] * (n - 1)
    for i in range(n):
        assert len(t.Iset[i]) == 0
        assert len(t.Jset[i]) == 0

    t = TensorCI2.from_function(f, [2] * n, [tuple([1] * n)])
    assert len(t) == n
    assert t.rank() == 1
    assert t.linkdims() == [1] * (n - 1)


def test_errors_and_warnings():
    n = 5
    f = lambda v: 1.0 / (sum(x**2 for x in v) + 1)

    with pytest.raises(ValueError):
        crossinterpolate2(np.float64, f, [2] * n,
                          tolerance=1e-9, pivottolerance=1e-2)
    with pytest.raises(ValueError):
        crossinterpolate2(np.float64, f, [2] * n, tolerance=0.0)

    t, _, _ = crossinterpolate2(np.float64, f, [2] * n, tolerance=0.1)
    with pytest.raises(ValueError):
        t.optimize(f, pivottolerance=0.1, tolerance=0.01)
    with pytest.raises(ValueError):
        t.optimize(f, tolerance=0.0)
    with pytest.warns(DeprecationWarning):
        t.optimize(f, pivottolerance=0.1)


def test_lorentz_smoke():
    """Fast tier: 4-D Lorentzian converges through the full optimize loop
    (slow acceptance: test_lorentz_mps with the reference's 5-D/10-grid)."""
    n, d = 4, 6
    f = lambda v: 1.0 / (sum((x + 1) ** 2 for x in v) + 1)
    t, ranks, errors = crossinterpolate2(
        np.float64, f, [d] * n, [tuple([0] * n)], tolerance=1e-6,
        rng=np.random.default_rng(5),
    )
    assert errors[-1] < 1e-6
    for v in [(0, 0, 0, 0), (1, 2, 3, 4), (5, 5, 5, 5)]:
        assert abs(t.evaluate(v) - f(v)) < 1e-5


@pytest.mark.slow
@pytest.mark.parametrize("coeff", [1.0, 0.5 - 1.0j])
@pytest.mark.parametrize("pivotsearch", ["full", "rook"])
def test_lorentz_mps(coeff, pivotsearch):
    n = 5
    # shift indices by +1 to match the reference's 1-based grid values
    f = lambda v: coeff / (sum((x + 1) ** 2 for x in v) + 1)
    dtype = np.complex128 if isinstance(coeff, complex) else np.float64
    rng = np.random.default_rng(99)

    t = TensorCI2.from_function(f, [10] * n, dtype=dtype)
    assert t.linkdims() == [1] * (n - 1)
    assert t.rank() == 1
    assert len(t.Iset[0]) == 1
    assert len(t.Jset[-1]) == 1

    for p in range(n - 1):
        t.updatepivots(p, f, True, reltol=1e-8, maxbonddim=2,
                       pivotsearch=pivotsearch)
    assert t.linkdims() == [2] * (n - 1)
    assert t.rank() == 2
    assert len(t.Iset[0]) == 1
    assert len(t.Jset[-1]) == 1

    globalpivot = (1, 8, 9, 4, 6)
    t.addglobalpivots1sitesweep(f, [globalpivot], reltol=1e-12)
    assert t.linkdims() == [3] * (n - 1)
    assert t.rank() == 3
    assert len(t.Iset[0]) == 1
    assert len(t.Jset[-1]) == 1

    for it in range(4, 21):
        for p in range(n - 1):
            t.updatepivots(p, f, True, reltol=1e-8, pivotsearch=pivotsearch)

    t2, ranks, errors = crossinterpolate2(
        dtype, f, [10] * n, [tuple([0] * n)],
        tolerance=1e-8, maxiter=8, sweepstrategy="forward",
        pivotsearch=pivotsearch, rng=rng,
    )
    if pivotsearch == "full":
        assert t.rank() == t2.rank()

    t3, ranks, errors = crossinterpolate2(
        dtype, f, [10] * n, [tuple([0] * n)],
        tolerance=1e-12, maxiter=200, pivotsearch=pivotsearch, rng=rng,
    )
    assert t3.pivoterror() <= 2e-12 * t3.maxsamplevalue
    assert all(d <= 200 for d in t3.linkdims())

    initialpivots = [
        (0, 0, 0, 0, 0),
        (9, 7, 9, 3, 3),
        (4, 3, 7, 8, 2),
        (6, 6, 9, 4, 8),
        (6, 6, 9, 4, 8),
    ]
    t4, ranks, errors = crossinterpolate2(
        dtype, f, [10] * n, initialpivots,
        tolerance=1e-12, maxiter=200, pivotsearch=pivotsearch, rng=rng,
    )
    assert t4.pivoterror() <= 2e-12 * t4.maxsamplevalue
    assert t4.rank() <= 200

    tt3 = tci.tensortrain(t3)
    for v in itertools.product(*[range(3)] * n):
        value = t3.evaluate(list(v))
        mat = None
        for p in range(n):
            m = tt3[p][:, v[p], :]
            mat = m if mat is None else mat @ m
        assert np.isclose(value, mat[0, 0])
        assert np.isclose(value, f(v))


@pytest.mark.slow
@pytest.mark.parametrize("seed", list(range(1, 11)))
@pytest.mark.parametrize("pivotsearch", ["full", "rook"])
def test_insert_global_pivots(seed, pivotsearch):
    # Reference sweeps seeds 1:20 at R=20 with 100 needles
    # (test_tensorci2.jl:343-393); this 1-CPU host runs seeds 1:10 at
    # R=16/50 needles in the slow tier plus one reference-fidelity spot
    # check (test_insert_global_pivots_reference_fidelity below).
    rng = np.random.default_rng(seed)
    R = 16
    abstol = 1e-4
    delta = 10.0 / 2**R
    grid = DiscretizedGrid(R, 0.0, 1.0)

    rindex = [tuple(rng.integers(0, 2, R)) for _ in range(50)]
    rpoint = [grid.quantics_to_origcoord(r)[0] for r in rindex]

    def fx(x):
        res = np.exp(-10 * x)
        for r in rpoint:
            if abs(x - r) < delta:
                res += 2 * abstol
        return res

    f = lambda bits: fx(grid.quantics_to_origcoord(bits)[0])

    localdims = [2] * R
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, [tuple([0] * R)],
        tolerance=abstol, maxbonddim=1000, maxiter=20, loginterval=1,
        verbosity=0, normalizeerror=False, pivotsearch=pivotsearch,
        strictlynested=False, rng=rng,
    )
    t.addglobalpivots2sitesweep(
        f, rindex,
        tolerance=abstol, normalizeerror=False, maxbonddim=1000,
        pivotsearch=pivotsearch, verbosity=0, strictlynested=False,
        ntry=1 if pivotsearch == "full" else 10,
    )
    nbad = sum(
        abs(t.evaluate(r) - f(r)) > abstol for r in rindex
    )
    assert nbad == 0


@pytest.mark.slow
@pytest.mark.parametrize("pivotsearch", ["full", "rook"])
def test_insert_global_pivots_reference_fidelity(pivotsearch):
    """One seed at the reference's full fidelity: R=20, 100 needles
    (test_tensorci2.jl:343-393)."""
    seed = 1
    rng = np.random.default_rng(seed)
    R = 20
    abstol = 1e-4
    delta = 10.0 / 2**R
    grid = DiscretizedGrid(R, 0.0, 1.0)

    rindex = [tuple(rng.integers(0, 2, R)) for _ in range(100)]
    rpoint = [grid.quantics_to_origcoord(r)[0] for r in rindex]

    def fx(x):
        res = np.exp(-10 * x)
        for r in rpoint:
            if abs(x - r) < delta:
                res += 2 * abstol
        return res

    f = lambda bits: fx(grid.quantics_to_origcoord(bits)[0])
    localdims = [2] * R
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, [tuple([0] * R)],
        tolerance=abstol, maxbonddim=1000, maxiter=20, loginterval=1,
        verbosity=0, normalizeerror=False, pivotsearch=pivotsearch,
        strictlynested=False, rng=rng,
    )
    t.addglobalpivots2sitesweep(
        f, rindex,
        tolerance=abstol, normalizeerror=False, maxbonddim=1000,
        pivotsearch=pivotsearch, verbosity=0, strictlynested=False,
        ntry=1 if pivotsearch == "full" else 10,
    )
    nbad = sum(abs(t.evaluate(r) - f(r)) > abstol for r in rindex)
    assert nbad == 0


def test_insert_global_pivots_needle():
    R = 20
    abstol = 1e-4
    f = lambda q: 1.0 if (all(x == 0 for x in q) or all(x == 1 for x in q)) else 0.0
    localdims = [2] * R
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, [tuple([0] * R)],
        tolerance=abstol, maxbonddim=1000, maxiter=20, loginterval=1,
        verbosity=0, normalizeerror=False, strictlynested=False,
        rng=np.random.default_rng(1234),
    )
    r = tuple([1] * R)
    t.addglobalpivots2sitesweep(
        f, [r],
        tolerance=abstol, normalizeerror=False, maxbonddim=1000,
        verbosity=0, strictlynested=False,
    )
    assert np.isclose(t.evaluate(r), f(r))


def test_globalsearch_nasty():
    n = 10
    grid = DiscretizedGrid(n, 0.0, 1.0)
    fx = lambda x: np.exp(-10 * x) * np.sin(2 * np.pi * 100 * x**1.1)
    f = lambda bits: fx(grid.quantics_to_origcoord(bits)[0])
    localdims = [2] * n
    rng = np.random.default_rng(1234)
    firstpivot = tci.optfirstpivot(
        f, localdims, [int(rng.integers(0, d)) for d in localdims]
    )
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, [tuple(firstpivot)],
        tolerance=1e-12, maxbonddim=100, maxiter=100,
        nsearchglobalpivot=10, strictlynested=False, rng=rng,
    )
    assert errors[-1] < 1e-10


def test_initialize_with_local_pivots_list(rng):
    N = 10
    M = rng.random((N, N))
    f = lambda v: M[v[0], v[1]]
    localdims = [N, N]
    mbd = 5
    t, ranks, errors = crossinterpolate2(
        np.float64, f, localdims, maxbonddim=mbd
    )
    t2 = TensorCI2.from_ijsets(f, localdims, t.Iset, t.Jset)
    assert t2.maxsamplevalue == t.maxsamplevalue
    assert t2.Iset == t.Iset
    assert t2.Jset == t.Jset


def test_crossinterpolate2_ttcache(rng):
    N = 4
    bonddims = [1, 2, 3, 2, 1]
    localdims = [2, 3, 3, 2]
    tt = tci.TensorTrain(
        [rng.random((bonddims[n], localdims[n], bonddims[n + 1]))
         for n in range(N)]
    )
    ttc = tci.TTCache(tt)
    t2, ranks, errors = crossinterpolate2(
        np.float64, ttc, localdims, tolerance=1e-10, maxbonddim=10
    )
    tt_reconst = tci.tensortrain(t2)
    for indices in itertools.product(*[range(d) for d in localdims]):
        assert np.isclose(tt_reconst(list(indices)), tt(list(indices)))


def test_convergencecriterion():
    assert not convergencecriterion(
        [1, 2], [1e-2, 1e-5], [0, 0], 1e-4, 4, 3
    )
    assert convergencecriterion(
        [1, 2, 2, 2], [1e-2, 1e-5, 1e-5, 1e-5], [0, 0, 0, 0], 1e-4, 4, 3
    )
    assert not convergencecriterion(
        [1, 2, 2, 2], [1e-2, 1e-2, 1e-5, 1e-5], [0, 0, 0, 0], 1e-4, 4, 3
    )
    assert convergencecriterion(
        [1, 2, 2, 2], [1e-2, 1e-2, 1e-2, 1e-2], [0, 0, 0, 0], 1e-4, 2, 3
    )
    assert convergencecriterion(
        [1, 2, 2, 2], [1e-2, 1e-2, 1e-2, 1e-2], [0, 1, 1, 1], 1e-4, 2, 3
    )


def test_sweep0site_removes_bad_pivots():
    """sweep0site prunes numerically bad pivots (tensorci2.jl:559-586)."""
    f = lambda v: 1.0 / (1.0 + sum((x + 1) ** 2 for x in v))
    t, _, _ = crossinterpolate2(np.float64, f, [6] * 4, tolerance=1e-10)
    r_before = t.rank()
    for b in range(len(t) - 1):
        t.sweep0site(f, b, reltol=1e-14)
    assert t.rank() <= r_before
    # pivot matrices stay square
    for b in range(len(t) - 1):
        assert len(t.Iset[b + 1]) == len(t.Jset[b])


def test_printnestinginfo(capsys):
    f = lambda v: 1.0 / (1.0 + sum((x + 1) ** 2 for x in v))
    t, _, _ = crossinterpolate2(np.float64, f, [4] * 4, tolerance=1e-8)
    t.printnestinginfo()
    out = capsys.readouterr().out
    assert "Nesting info: Iset" in out
    assert "Nesting info: Jset" in out


def test_stats_recorded():
    f = lambda v: 1.0 / (1.0 + sum((x + 1) ** 2 for x in v))
    t, ranks, errors = crossinterpolate2(np.float64, f, [4] * 4,
                                         tolerance=1e-8)
    assert len(t.stats["iteration_walltime"]) == len(ranks)
    assert len(t.stats["sweep_walltime"]) == len(ranks)
    assert all(w > 0 for w in t.stats["iteration_walltime"])


def test_optimize_profile_dir(tmp_path):
    """profile_dir records a jax.profiler trace of the whole optimization
    (SURVEY §5 tracing plan) alongside the stats dict."""
    import os

    f = lambda v: 1.0 / (1.0 + sum((x - 1.0) ** 2 for x in v))
    t, ranks, errors = tci.crossinterpolate2(
        np.float64, f, [4] * 4, tolerance=1e-6,
        profile_dir=str(tmp_path / "trace"),
    )
    assert errors[-1] < 1e-6
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found, "no profiler trace files were written"
    assert t.stats["iteration_walltime"]
