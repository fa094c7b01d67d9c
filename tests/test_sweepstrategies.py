"""Port of test/test_sweepstrategies.jl."""

from tci_tpu import forwardsweep


def test_forwardsweep():
    iters = range(1, 6)
    assert [forwardsweep("forward", i) for i in iters] == [True] * 5
    assert [forwardsweep("backward", i) for i in iters] == [False] * 5
    assert [forwardsweep("backandforth", i) for i in iters] == [
        i % 2 == 1 for i in iters
    ]
