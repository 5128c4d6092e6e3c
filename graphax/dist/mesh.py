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


# ----------------------------------------------------------------------
# Varying-manual-axes (vma) helpers
# ----------------------------------------------------------------------
#
# Newer JAX shard_map tracks, per value, the set of mesh axes it *varies*
# over and rejects custom-VJP rules whose cotangent vma does not match the
# primal input's. A replicated (unvarying) parameter whose cotangent is
# computed per-shard trips that check. The idiomatic fix is to cast the
# parameters to "varying" at the top of the differentiated function:
# forward values are unchanged, and the cast's transpose is exactly a psum
# over the axis — so the resulting gradient is the correctly summed global
# gradient and no outer `jax.lax.psum(grads)` is needed.

def _pcast_varying():
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return lambda x, axis: pcast(x, axis, to="varying")
    pvary = getattr(jax.lax, "pvary", None)
    if pvary is not None:
        return pvary
    return None


#: True when this JAX has the vma machinery (typeof().vma + pcast/pvary).
HAS_VMA: bool = (_pcast_varying() is not None and hasattr(jax, "typeof"))


def ensure_varying(x, axis_name: str):
    """Return ``x`` guaranteed varying over ``axis_name`` (no-op if it
    already is, or if this JAX predates the vma system)."""
    cast = _pcast_varying()
    if cast is None or not hasattr(jax, "typeof"):
        return x
    vma = getattr(jax.typeof(x), "vma", None)
    if vma is None or axis_name in vma:
        return x
    return cast(x, axis_name)


def ensure_varying_tree(tree, axis_name: str):
    """:func:`ensure_varying` over every leaf of a pytree.

    When applied to the parameters at the top of a loss function inside
    shard_map, the transpose of the inserted casts psums the parameter
    cotangents over ``axis_name`` — callers must then NOT psum those
    gradients again outside."""
    return jax.tree_util.tree_map(lambda x: ensure_varying(x, axis_name),
                                  tree)
