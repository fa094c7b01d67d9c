"""Checkpoint / resume for TCI optimization state.

The reference has no checkpointing (SURVEY.md §5); its objects live in the
Julia session and conversions serve as de-facto snapshots. Here the full TCI2
state — index sets, site tensors, error bookkeeping — serializes to a single
``.npz`` file; ``optimize`` on a restored object resumes sweeping (the
reference explicitly supports re-optimizing an existing tci:
test/test_conversion.jl:67, ctor from Iset/Jset src/tensorci2.jl:123-137).
"""

from __future__ import annotations

import json
import numpy as np

from ..models.tensorci2 import TensorCI2
from ..models.tensortrain import TensorTrain


def save_tci2(path: str, tci: TensorCI2) -> None:
    """Serialize a TensorCI2 to `path` (.npz)."""
    payload = {
        "localdims": np.asarray(tci.localdims, dtype=np.int64),
        "bonderrors": np.asarray(tci.bonderrors, dtype=np.float64),
        "pivoterrors": np.asarray(tci.pivoterrors, dtype=np.float64),
        "maxsamplevalue": np.float64(tci.maxsamplevalue),
        "dtype": np.str_(np.dtype(tci.dtype).name),
        "meta": np.str_(
            json.dumps(
                {
                    "Iset": [[list(i) for i in s] for s in tci.Iset],
                    "Jset": [[list(j) for j in s] for s in tci.Jset],
                }
            )
        ),
    }
    for b, t in enumerate(tci.sitetensors()):
        payload[f"sitetensor_{b}"] = t
    np.savez_compressed(path, **payload)


def load_tci2(path: str) -> TensorCI2:
    """Restore a TensorCI2 saved with save_tci2."""
    data = np.load(path, allow_pickle=False)
    localdims = [int(d) for d in data["localdims"]]
    dtype = np.dtype(str(data["dtype"]))
    tci = TensorCI2(localdims, dtype=dtype)
    meta = json.loads(str(data["meta"]))
    tci.Iset = [[tuple(i) for i in s] for s in meta["Iset"]]
    tci.Jset = [[tuple(j) for j in s] for s in meta["Jset"]]
    tci.bonderrors = np.asarray(data["bonderrors"])
    tci.pivoterrors = list(np.asarray(data["pivoterrors"]))
    tci.maxsamplevalue = float(data["maxsamplevalue"])
    for b in range(len(localdims)):
        tci._sitetensors[b] = np.asarray(data[f"sitetensor_{b}"])
    return tci


def save_tensortrain(path: str, tt: TensorTrain) -> None:
    np.savez_compressed(
        path, **{f"core_{i}": t for i, t in enumerate(tt.sitetensors())}
    )


def load_tensortrain(path: str) -> TensorTrain:
    data = np.load(path, allow_pickle=False)
    n = len(data.files)
    return TensorTrain([np.asarray(data[f"core_{i}"]) for i in range(n)])
