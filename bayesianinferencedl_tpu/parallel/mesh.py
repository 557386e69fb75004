"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def device_mesh(n_devices: int | None = None, axis_name: str = "devices") -> Mesh:
    """1-D mesh over the first ``n_devices`` visible devices (default: all).

    A single axis suffices here: every parallel workload in this framework is
    an independent-sample batch (chains, snapshots, training shards), so the
    mesh maps it straight onto ICI neighbors (SURVEY.md §2c)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))
