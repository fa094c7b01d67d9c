"""Port of test/test_conversion.jl (0-based indices)."""

import itertools

import numpy as np

import tci_tpu as tci
from tci_tpu import TensorCI1, TensorCI2, MatrixACA, rrlu
from tci_tpu.models.conversion import (
    aca_from_rrlu,
    tci1_from_tci2,
    tci2_from_tci1,
    tci2_from_tensortrain,
)


def test_rrlu_to_aca():
    A = np.array([
        [0.412779, 0.423091, 0.166912, 0.953768, 0.207438, 0.600653],
        [0.273203, 0.622319, 0.715224, 0.646002, 0.0508133, 0.482628],
        [0.562037, 0.0616797, 0.455742, 0.00227183, 0.411564, 0.345012],
        [0.537797, 0.955916, 0.656385, 0.463868, 0.449098, 0.146251],
        [0.245995, 0.77942, 0.389488, 0.714201, 0.416509, 0.00404971],
        [0.604805, 0.0745451, 0.228923, 0.881908, 0.0640686, 0.514265],
    ])
    lu = rrlu(A, maxrank=4)
    aca = aca_from_rrlu(lu)
    assert aca.nrows() == 6
    assert aca.ncols() == 6
    assert np.allclose(aca.evaluate(), lu.left() @ lu.right())


def test_tci1_tci2_conversion(rng):
    d, n = 3, 4

    # empty conversion
    t1 = TensorCI1([d] * n, dtype=np.complex128)
    t2 = tci2_from_tci1(t1)
    assert len(t2) == len(t1)
    assert t2.sitedims() == t1.sitedims()
    assert t2.rank() == 0
    assert all(len(s) == 0 for s in t2.Iset)
    assert all(len(s) == 0 for s in t2.Jset)

    # rank-1 from a random function
    cache = {}
    frand = lambda v: cache.setdefault(
        tuple(v), complex(rng.random(), rng.random())
    )
    globalpivot = (1, 1, 2, 0)
    t1 = TensorCI1.from_function(frand, [d] * n, globalpivot,
                                 dtype=np.complex128)
    t2 = tci2_from_tci1(t1)
    assert t2.rank() == 1
    assert t2.linkdims() == t1.linkdims()

    f = lambda v: (1.0 + 2.0j) / (sum((x + 1) ** 2 for x in v) + 1)
    t1, ranks, errors = tci.crossinterpolate1(
        np.complex128, f, [d] * n, [0] * n,
        tolerance=1e-6, pivottolerance=1e-8, maxiter=4,
        sweepstrategy="forward",
    )
    t2 = tci2_from_tci1(t1)
    t1b = tci1_from_tci2(t2, f)
    t2b = tci2_from_tci1(t1b)
    assert t2.rank() == t1.rank()
    assert t1b.rank() == t1.rank()
    assert t2b.rank() == t2.rank()
    assert t2.linkdims() == t1.linkdims()
    assert t1b.linkdims() == t1.linkdims()
    assert t2b.linkdims() == t2.linkdims()
    for v in itertools.product(*[range(d)] * n):
        assert np.isclose(t1.evaluate(v), t2.evaluate(v))
        assert np.isclose(t1.evaluate(v), t1b.evaluate(v))

    ranks, errs = t2.optimize(f, tolerance=1e-12)
    assert t2.pivoterror() <= 1e-12 * t2.maxsamplevalue
    assert t2.rank() > t1.rank()
    for v in itertools.product(*[range(d)] * n):
        assert np.isclose(t2.evaluate(v), f(v))


def test_tt_tci2_conversion():
    f = lambda v: (1.0 + 2.0j) / (sum((x + 1) ** 2 for x in v) + 1)
    t, _, _ = tci.crossinterpolate2(
        np.complex128, f, [4] * 4, tolerance=1e-14, maxbonddim=5
    )
    tt = tci.tensortrain(t)
    tb = tci2_from_tensortrain(tt, tolerance=1e-14)

    assert tt.rank() == 5
    assert tt.linkdims() == t.linkdims()
    assert tt.sitedims() == [[4]] * 4

    assert tb.rank() == 5
    assert tb.linkdims() == tt.linkdims()
    assert tb.sitedims() == [[4]] * 4

    for v in itertools.product(*[range(4)] * 4):
        assert abs(tt(v) - t(v)) < 1e-13
        assert abs(tb(v) - t(v)) < 1e-12

    tb.optimize(f, tolerance=1e-14)
    for v in itertools.product(*[range(4)] * 4):
        assert abs(tb(v) - f(v)) < 1e-13
