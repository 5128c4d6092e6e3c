"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("graph",),
              devices=None) -> Mesh:
    """Build a Mesh over available devices. Default: 1-D 'graph' axis over
    all devices (edge/node partition rides ICI). For DP×graph use
    shape=(d, g), axis_names=('data', 'graph')."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} needs {n} devices, " \
        f"have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(shape)
    assert len(axis_names) == len(shape)
    return Mesh(dev_array, axis_names)


def local_mesh(axis_name: str = "graph") -> Mesh:
    """Trivial 1-device mesh — single-chip runs degrade to no-op collectives."""
    return Mesh(np.asarray(jax.devices()[:1]), (axis_name,))
