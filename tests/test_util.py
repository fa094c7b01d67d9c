"""Port of test/test_util.jl (0-based indices)."""

import numpy as np

from tci_tpu import isconstant, maxabs, optfirstpivot, pushunique, randomsubset


def test_maxabs():
    s = 1.0
    assert maxabs(s, []) == 1.0
    u = [0.11892436782208138, -0.5312119179782191, 0.15328557552100353,
         0.9343319135479445, -0.04286173791053016]
    assert maxabs(s, u) == 1.0
    v = [-7.512961239635482, -0.644254782278785, 1.1242493861712504,
         6.5875869748554186, -5.400768247401216]
    assert maxabs(s, v) == 7.512961239635482


def test_optfirstpivot():
    # f maximal when all indices maximal (0-based: v in {0,1}^3)
    f = lambda v: 4 * v[2] + 2 * v[1] + v[0]
    localdims = [2, 2, 2]
    pivot = optfirstpivot(f, localdims, [0, 0, 0])
    assert pivot == [1, 1, 1]


def test_optfirstpivot_batched_matches_scalar():
    """The batch-protocol path (one call per leg) must follow the exact
    trajectory of the scalar accept-if-greater scan."""
    from tci_tpu.parallel.batcheval import BatchEvaluatorAdapter

    rng = np.random.default_rng(11)
    localdims = [3, 4, 2, 5]
    table = rng.standard_normal(tuple(localdims))

    def f(v):
        return table[tuple(int(x) for x in v)]

    calls = {"batch": 0}

    class CountingAdapter(BatchEvaluatorAdapter):
        def batch_evaluate(self, Iset, Jset, ncent=None):
            calls["batch"] += 1
            return super().batch_evaluate(Iset, Jset, ncent)

    for start in ([0, 0, 0, 0], [2, 1, 1, 3]):
        scalar = optfirstpivot(f, localdims, list(start))
        calls["batch"] = 0
        bf = CountingAdapter(f, localdims)
        batched = optfirstpivot(bf, localdims, list(start))
        assert batched == scalar
        # one protocol call per (sweep, leg) — never per candidate
        assert calls["batch"] % len(localdims) == 0
        assert calls["batch"] <= 3 * len(localdims)


def test_pushunique():
    v = [9, 29, 4, 5]
    pushunique(v, 10)
    assert v == [9, 29, 4, 5, 10]
    pushunique(v, 10)
    assert v == [9, 29, 4, 5, 10]
    pushunique(v, 2, 3)
    assert v == [9, 29, 4, 5, 10, 2, 3]
    pushunique(v, 29, 8, 4, 5)
    assert v == [9, 29, 4, 5, 10, 2, 3, 8]


def test_isconstant():
    v = [0.29, 0.46, 0.87, 0.89, 0.31]
    u = [3, 3, 3, 3]
    assert not isconstant(v)
    assert isconstant(u)
    assert isconstant([])


def test_randomsubset(rng):
    v = [0.228, 0.919, 0.086, 0.834, 0.916, 0.970]
    b = randomsubset(v, 3, rng)
    assert len(b) == 3
    assert set(b) <= set(v)
    assert len(set(b)) == 3
    assert randomsubset(v, 0, rng) == []
    assert len(randomsubset(v, 100, rng)) == len(v)
