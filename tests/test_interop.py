"""Interop + checkpoint tests (parity target: test_TCIITensorConversion.jl,
plus the checkpoint/resume subsystem from SURVEY.md §5)."""

import itertools

import numpy as np
import pytest

import tci_tpu as tci
from tci_tpu.models.tensortrain import TensorTrain
from tci_tpu.interop import (
    evaluate_mps,
    from_mps_tensors,
    from_mpo_tensors,
    to_mps_tensors,
    to_mpo_tensors,
)
from tci_tpu.utils.checkpoint import (
    load_tci2,
    load_tensortrain,
    save_tci2,
    save_tensortrain,
)


def test_mps_roundtrip(rng):
    linkdims = [1, 2, 3, 1]
    L = 3
    tt = tci.TensorTrain(
        [rng.random((linkdims[n], 4, linkdims[n + 1])) for n in range(L)]
    )
    arrays = to_mps_tensors(tt)
    tt2 = from_mps_tensors(arrays)
    for i in itertools.product(*[range(4)] * L):
        assert np.isclose(tt(list(i)), tt2(list(i)))
        assert np.isclose(tt(list(i)), evaluate_mps(arrays, i))


def test_mpo_roundtrip(rng):
    linkdims = [1, 2, 1]
    L = 2
    tt = tci.TensorTrain(
        [rng.random((linkdims[n], 2, 3, linkdims[n + 1])) for n in range(L)]
    )
    arrays = to_mpo_tensors(tt)
    tt2 = from_mpo_tensors(arrays)
    for i in itertools.product(range(2), range(3), range(2), range(3)):
        idx = [(i[0], i[1]), (i[2], i[3])]
        assert np.isclose(tt(idx), tt2(idx))


def test_checkpoint_roundtrip(tmp_path, rng):
    f = lambda v: 1.0 / (1.0 + sum((x - 1) ** 2 for x in v))
    t, ranks, errors = tci.crossinterpolate2(
        np.float64, f, [4] * 4, tolerance=1e-6
    )
    path = str(tmp_path / "ckpt.npz")
    save_tci2(path, t)
    t2 = load_tci2(path)
    assert t2.localdims == t.localdims
    assert t2.Iset == t.Iset
    assert t2.Jset == t.Jset
    assert t2.maxsamplevalue == t.maxsamplevalue
    for v in itertools.product(*[range(4)] * 4):
        assert np.isclose(t2.evaluate(v), t.evaluate(v))

    # resume: continue optimizing the restored state to a tighter tolerance
    t2.optimize(f, tolerance=1e-10)
    for v in itertools.product(*[range(4)] * 4):
        assert abs(t2.evaluate(v) - f(v)) < 1e-9


def test_tensortrain_checkpoint(tmp_path, rng):
    tt = tci.TensorTrain(
        [rng.random((1, 3, 2)), rng.random((2, 3, 2)), rng.random((2, 3, 1))]
    )
    path = str(tmp_path / "tt.npz")
    save_tensortrain(path, tt)
    tt2 = load_tensortrain(path)
    for i in itertools.product(*[range(3)] * 3):
        assert np.isclose(tt(list(i)), tt2(list(i)))


def test_checkpoint_complex(tmp_path):
    f = lambda v: np.exp(1j * sum(v)) / (1.0 + sum((x - 1) ** 2 for x in v))
    t, _, _ = tci.crossinterpolate2(np.complex128, f, [3] * 4, tolerance=1e-8)
    path = str(tmp_path / "c.npz")
    save_tci2(path, t)
    t2 = load_tci2(path)
    assert t2.dtype == t.dtype
    for v in itertools.product(*[range(3)] * 4):
        assert np.isclose(t2.evaluate(v), t.evaluate(v))


# -- quimb interop (reference: ext/TCIITensorConversion/ttmpsconversion.jl) --
# quimb is an optional dependency (not installable in this environment:
# no-network image); the real-library round trips below skip with that
# reason, and the array-layout logic of from_quimb_mps is exercised against
# a minimal stand-in exposing quimb's `arrays` (l, r, p) layout.

try:
    import quimb.tensor as _qtn  # noqa: F401

    _HAS_QUIMB = True
except ImportError:
    _HAS_QUIMB = False


class _FakeQuimbMPS:
    """Stand-in exposing quimb's MatrixProductState.arrays layout:
    first site (right, phys), middle (left, right, phys), last (left, phys)."""

    def __init__(self, arrays):
        self.arrays = arrays


def test_from_quimb_layout_roundtrip(rng):
    from tci_tpu.interop.mps import (
        evaluate_mps,
        from_quimb_mps,
        to_mps_tensors,
        to_quimb_arrays,
    )

    tt = TensorTrain(
        [
            rng.standard_normal((b1, 2, b2))
            for b1, b2 in zip([1, 3, 4, 3], [3, 4, 3, 1])
        ]
    )
    raw = to_mps_tensors(tt)
    # the production lrp layout (everything to_quimb_mps does except the
    # quimb constructor call itself)
    arrays = to_quimb_arrays(tt)
    assert arrays[0].shape == (3, 2)
    assert arrays[1].shape == (3, 4, 2)
    assert arrays[-1].shape == (3, 2)
    back = from_quimb_mps(_FakeQuimbMPS(arrays))
    for idx in [(0, 0, 0, 0), (1, 1, 1, 1), (0, 1, 0, 1)]:
        assert abs(back.evaluate(idx) - tt.evaluate(idx)) < 1e-12
        assert abs(evaluate_mps(raw, idx) - tt.evaluate(idx)) < 1e-12


def test_quimb_import_error_message():
    from tci_tpu.interop.mps import from_quimb_mps, to_quimb_mps

    if _HAS_QUIMB:
        pytest.skip("quimb installed; error-path test not applicable")
    tt = TensorTrain([np.ones((1, 2, 1))] * 2)
    with pytest.raises(ImportError, match="quimb"):
        to_quimb_mps(tt)
    with pytest.raises(TypeError, match="quimb MatrixProductState-like"):
        from_quimb_mps(object())


def test_to_quimb_mps_executes_via_module_standin(rng, monkeypatch):
    """Run the REAL `to_quimb_mps` body (import + constructor call) by
    injecting a minimal quimb.tensor stand-in into sys.modules.

    The stand-in enforces the same constructor contract quimb does for
    ``MatrixProductState(arrays, shape="lrp")`` — rank-2 end sites,
    rank-3 middle sites, a shape string naming l/r/p axes — and exposes
    ``.arrays`` in (l, r, p) order, which is what `from_quimb_mps`
    consumes. Everything except quimb's own internals executes."""
    import sys
    import types

    from tci_tpu.interop.mps import from_quimb_mps, to_quimb_mps

    class _MPS:
        def __init__(self, arrays, shape="lrp"):
            arrays = list(arrays)
            if sorted(shape) != ["l", "p", "r"]:
                raise ValueError(f"bad shape string {shape!r}")
            n = len(arrays)
            out = []
            for i, a in enumerate(arrays):
                # end sites drop the dangling virtual axis from the string
                if i == 0:
                    axes = [c for c in shape if c != "l"]
                elif i == n - 1:
                    axes = [c for c in shape if c != "r"]
                else:
                    axes = list(shape)
                if a.ndim != len(axes):
                    raise ValueError(
                        f"site {i}: rank {a.ndim} != axes {axes}"
                    )
                canon = [c for c in "lrp" if c in axes]
                out.append(np.transpose(a, [axes.index(c) for c in canon]))
            self.arrays = out

    qt = types.ModuleType("quimb.tensor")
    qt.MatrixProductState = _MPS
    q = types.ModuleType("quimb")
    q.tensor = qt
    monkeypatch.setitem(sys.modules, "quimb", q)
    monkeypatch.setitem(sys.modules, "quimb.tensor", qt)

    tt = TensorTrain(
        [
            rng.standard_normal((b1, 2, b2))
            for b1, b2 in zip([1, 3, 4, 3], [3, 4, 3, 1])
        ]
    )
    mps = to_quimb_mps(tt)
    assert [a.shape for a in mps.arrays] == [
        (3, 2), (3, 4, 2), (4, 3, 2), (3, 2)
    ]
    back = from_quimb_mps(mps)
    for idx in itertools.product(*[range(2)] * 4):
        assert abs(back.evaluate(idx) - tt.evaluate(idx)) < 1e-12


@pytest.mark.skipif(
    not _HAS_QUIMB,
    reason="quimb not installed (optional dep; no-network image — "
    "cannot pip install). Logic covered by the layout stand-in test.",
)
def test_quimb_real_roundtrip(rng):
    from tci_tpu.interop.mps import from_quimb_mps, to_quimb_mps

    tt = TensorTrain(
        [
            rng.standard_normal((b1, 2, b2))
            for b1, b2 in zip([1, 3, 3], [3, 3, 1])
        ]
    )
    back = from_quimb_mps(to_quimb_mps(tt))
    for idx in [(0, 0, 0), (1, 1, 1), (0, 1, 0)]:
        assert abs(back.evaluate(idx) - tt.evaluate(idx)) < 1e-12
