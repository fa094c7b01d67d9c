"""Device mesh helpers for multi-chip TCI.

The parallelism axis in TCI is the function-sample batch (SURVEY.md §2.5):
pivot-panel sampling is embarrassingly parallel over assembled index rows, so
we shard that batch over a 1-D mesh and let XLA ride ICI for the gather of the
panel. The LU elimination itself is replicated (it is tiny compared to
sampling for expensive integrands).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
