"""MPS/MPO interop (parity: ext/TCIITensorConversion/).

The reference converts TensorTrain <-> ITensors.MPS/MPO
(ttmpsconversion.jl:1-124) and evaluates an MPS at index lists
(mpsutil.jl:13-50). ITensors is a Julia package; the Python ecosystem
equivalent is quimb (optional — gated on availability). The plain-array
conversions below are the stable interchange format: a list of
(left, phys..., right) arrays, exactly the layout ITensors/quimb/TeNPy all
accept.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..models.tensortrain import TensorTrain


def to_mps_tensors(tt: TensorTrain) -> List[np.ndarray]:
    """Site tensors as (left, phys, right) arrays (MPS convention)."""
    return [np.asarray(t).reshape(t.shape[0], -1, t.shape[-1])
            for t in tt.sitetensors()]


def from_mps_tensors(tensors: Sequence[np.ndarray]) -> TensorTrain:
    return TensorTrain([np.asarray(t) for t in tensors])


def to_mpo_tensors(tt: TensorTrain) -> List[np.ndarray]:
    """Site tensors as (left, up, down, right) arrays (MPO convention);
    requires a 4-leg tensor train."""
    for t in tt.sitetensors():
        if t.ndim != 4:
            raise ValueError("to_mpo_tensors requires a 4-leg tensor train.")
    return [np.asarray(t) for t in tt.sitetensors()]


def from_mpo_tensors(tensors: Sequence[np.ndarray]) -> TensorTrain:
    tensors = [np.asarray(t) for t in tensors]
    for t in tensors:
        if t.ndim != 4:
            raise ValueError("from_mpo_tensors requires 4-leg tensors.")
    return TensorTrain(tensors)


def evaluate_mps(tensors: Sequence[np.ndarray], indexset) -> complex:
    """Evaluate an MPS given as raw arrays at one multi-index
    (parity: ext mpsutil.jl:13-50)."""
    v = None
    for t, i in zip(tensors, indexset):
        mat = t[:, i, :]
        v = mat if v is None else v @ mat
    return v[0, 0]


def to_quimb_arrays(tt: TensorTrain) -> List[np.ndarray]:
    """Site arrays in quimb's ``shape="lrp"`` MatrixProductState layout:
    first site (right, phys), middle sites (left, right, phys), last site
    (left, phys). This is the entire conversion; `to_quimb_mps` only hands
    the result to quimb's constructor. Inverse of `from_quimb_mps`."""
    arrays = []
    tensors = to_mps_tensors(tt)
    for i, t in enumerate(tensors):
        if i == 0:
            arrays.append(t[0, :, :].transpose(1, 0))  # (right, phys)
        elif i == len(tensors) - 1:
            arrays.append(t[:, :, 0])  # (left, phys)
        else:
            arrays.append(t.transpose(0, 2, 1))  # (left, right, phys)
    return arrays


def to_quimb_mps(tt: TensorTrain):
    """Convert to a quimb MatrixProductState (requires quimb installed)."""
    try:
        import quimb.tensor as qtn
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "quimb is not installed; use to_mps_tensors for raw arrays."
        ) from e
    return qtn.MatrixProductState(to_quimb_arrays(tt), shape="lrp")


def from_quimb_mps(mps) -> TensorTrain:
    """Convert a quimb MatrixProductState back to a TensorTrain.

    Consumes any object exposing quimb's array layout (`arrays` in (l, r, p)
    order, or `arrays_l_r_p()`), so it does not itself require quimb."""
    if hasattr(mps, "arrays_l_r_p"):
        arrays = [np.asarray(t.data) for t in mps.arrays_l_r_p()]
    elif hasattr(mps, "arrays"):
        arrays = [np.asarray(a) for a in mps.arrays]
    else:
        raise TypeError(
            "from_quimb_mps expects a quimb MatrixProductState-like object "
            "with .arrays (l, r, p layout) or .arrays_l_r_p()."
        )
    out = []
    n = len(arrays)
    for i, a in enumerate(arrays):
        if i == 0:
            # (right, phys) -> (1, phys, right)
            out.append(a.transpose(1, 0)[None, :, :])
        elif i == n - 1:
            # (left, phys) -> (left, phys, 1)
            out.append(a[:, :, None])
        else:
            # (left, right, phys) -> (left, phys, right)
            out.append(a.transpose(0, 2, 1))
    return TensorTrain(out)
