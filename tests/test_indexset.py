"""Port of test/test_indexset.jl (0-based indices)."""

from tci_tpu import IndexSet, isnested


def test_indexset_basic():
    is_ = IndexSet()
    assert is_.toint == {}
    assert is_.fromint == []
    assert len(is_) == 0
    assert is_.isempty()
    assert is_ == IndexSet()

    L = [
        (6, 0, 9, 1, 0), (8, 7, 4, 7, 6), (1, 8, 4, 3, 0), (3, 7, 1, 6, 8),
        (7, 7, 0, 6, 0), (8, 3, 6, 0, 9), (1, 1, 4, 7, 0), (9, 6, 9, 9, 5),
        (1, 8, 5, 9, 9), (6, 3, 6, 4, 6),
    ]
    for i, l in enumerate(L):
        is_.push(l)
        assert is_[i] == l
        assert is_.toint[l] == i
        assert is_.fromint[i] == l
        assert l in is_

    assert len(is_) == len(L)
    assert not is_.isempty()
    assert is_ == IndexSet(L)
    assert is_.pos(L[3]) == 3
    assert is_.pos([L[0], L[2]]) == [0, 2]


def test_isnested():
    is1 = [(1,), (2,)]
    is2 = [(1, 4), (2, 3)]
    assert isnested(is1, is2)
    is3 = [(4, 1), (3, 2)]
    assert isnested(is1, is3, "col")
    assert not isnested(is1, [(3, 4)], "row")
    assert not isnested(is1, [()], "row")
