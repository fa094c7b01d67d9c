"""Device mesh helpers for multi-chip TCI.

The parallelism axis in TCI is the function-sample batch (SURVEY.md §2.5):
pivot-panel sampling is embarrassingly parallel over assembled index rows, so
we shard that batch over a 1-D mesh and let XLA ride ICI for the gather of the
panel. The LU elimination itself is replicated (it is tiny compared to
sampling for expensive integrands).
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    """1-D mesh over the first `n_devices` devices.

    When more devices are requested than the default platform provides
    (e.g. a single tunneled TPU chip while the caller wants an 8-way dry
    run), fall back to the virtual CPU device pool — multi-chip sharding is
    then validated on host devices, which is exactly what
    ``--xla_force_host_platform_device_count`` provides. The fallback is
    loudly warned about so a benchmark can never silently report CPU-mesh
    numbers as accelerator numbers.
    """
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if len(cpus) >= n_devices:
            warnings.warn(
                f"default_mesh: requested {n_devices} devices but the "
                f"default platform ({devices[0].platform if devices else '?'}) "
                f"has only {len(devices)}; falling back to a VIRTUAL CPU "
                "mesh. Sharding semantics are validated, but any timing "
                "measured on this mesh is a CPU number.",
                RuntimeWarning,
                stacklevel=2,
            )
            devices = cpus
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available; set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
                "virtual CPU mesh"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
