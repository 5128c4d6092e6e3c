"""Static-shape padded graph container.

The reference threads `edge_index [B, 2, E]` + `edge_weight` tensors through
every layer and re-densifies them to `[B, N, N]` for each sparse product
(reference `src/utils.py:16-113`, `src/function_laplacian_diffusion.py:39-58`).
Here the graph is a frozen pytree with *static* buffer sizes so that a jitted
solver sees one fixed program: real edges occupy a prefix of the buffers and
`num_edges` masks the rest.

Conventions (matching the reference's sparse-matrix view, A[row, col]):

- ``row``   = ``edge_index[0]`` — the aggregation target of SpMM: for
  ``y = A @ x``, ``y[i] = sum over edges e with row[e]==i of w[e] * x[col[e]]``.
- ``col``   = ``edge_index[1]`` — the node gathered from.
- Padded entries have ``row = col = 0`` and ``weight = 0`` so weighted
  segment-sums are exact without branching; score-space ops (softmax) must
  apply ``edge_mask`` explicitly.

Batching is by ``jax.vmap`` over a leading axis, not by baked-in batch dims.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A padded, static-shape sparse graph.

    Attributes:
      row: ``[E_pad]`` int32 — aggregation index of each edge (edge_index[0]).
      col: ``[E_pad]`` int32 — gather index of each edge (edge_index[1]).
      edge_weight: ``[E_pad]`` float — per-edge weight (0 on padding).
      num_edges: scalar int32 — true number of edges (may be traced; rewiring
        changes it without changing buffer shapes).
      num_nodes: static int — number of nodes (shapes depend on it).
      node_mask: optional ``[N]`` bool — true nodes when N itself is padded.
    """

    row: jax.Array
    col: jax.Array
    edge_weight: jax.Array
    num_edges: jax.Array
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    node_mask: Optional[jax.Array] = None
    # optional row-tiled layout (graphax.kernels.RowTiles) enabling the
    # scatter-free MXU segment-reduction path; None → XLA segment ops
    tiles: Optional[object] = None
    # optional transpose (col-tiled) layout: same RowTiles type built on the
    # reversed edges, used by the Pallas custom_vjp for dx = Aᵀg
    # (graphax.kernels.pallas_tiled). Its edge_slot indexes the ORIGINAL
    # edge buffers, so one [E] value vector serves both layouts.
    tiles_t: Optional[object] = None
    # optional windowed (block-dense) layout (graphax.kernels.windows
    # WindowTiles) for community-ordered graphs: in-window edges become
    # dense [tile, window] operator blocks (built once per forward) so the
    # SpMM is a pure batched MXU matmul instead of the granule-bound random
    # row gather (attached by kernels.dispatch.attach_windows)
    windows: Optional[object] = None
    # optional hub layout (graphax.kernels.hubs.HubTiles) for power-law
    # graphs: edges into the top-H in-degree columns become dense
    # [T, tile, H] operator blocks served from a tiny x[hub_ids] slab (one
    # MXU matmul) instead of the granule-bound random gather; the rest ride
    # their own RowTiles pair (attached by kernels.hubs.attach_hubs)
    hubs: Optional[object] = None
    # compute strategy: 'edge' (XLA segment ops), 'tiled' (MXU one-hot
    # reductions over row tiles), 'dense' (materialized [N,N] operator —
    # fastest for N ≲ 20k; see graphax.kernels.dense_path), 'windowed'
    # (block-dense in-window blocks + gather residual)
    strategy: str = dataclasses.field(default="edge",
                                      metadata=dict(static=True))
    # True when the per-forward weight normalization (`reset_graph_data`,
    # `src/base_classes.py:70-90`) has already been applied host-side:
    # `blocks.common.normalize_graph` then returns the graph unchanged.
    # The weights are static through training (topology only changes at
    # rewiring, which re-normalizes), so Trainer hoists the normalization
    # out of the solve — the same hoist the sharded model does at
    # partition time. Measured: 31 ms per forward at ogbn-arxiv scale.
    pre_normalized: bool = dataclasses.field(default=False,
                                             metadata=dict(static=True))

    @property
    def edge_buffer_size(self) -> int:
        return self.row.shape[-1]

    @property
    def edge_mask(self) -> jax.Array:
        """``[E_pad]`` bool — True for real edges."""
        return jnp.arange(self.edge_buffer_size, dtype=jnp.int32) < self.num_edges

    def with_weights(self, edge_weight: jax.Array) -> "Graph":
        return dataclasses.replace(self, edge_weight=edge_weight)

    def with_edges(self, row: jax.Array, col: jax.Array, edge_weight: jax.Array,
                   num_edges: jax.Array) -> "Graph":
        """Replace topology in-place (same buffer size) — used by rewiring."""
        assert row.shape == self.row.shape, (row.shape, self.row.shape)
        return dataclasses.replace(
            self, row=row, col=col, edge_weight=edge_weight,
            num_edges=jnp.asarray(num_edges, jnp.int32))

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @staticmethod
    def from_edges(row, col, num_nodes: int, edge_weight=None,
                   edge_buffer_size: Optional[int] = None) -> "Graph":
        """Build a padded Graph from host edge arrays.

        Behavioral twin of constructing `edge_index`/`edge_weight` in the
        reference (`src/utils.py:215-233` default all-ones weights).
        """
        row = np.asarray(row, dtype=np.int32)
        col = np.asarray(col, dtype=np.int32)
        e = int(row.shape[0])
        if edge_weight is None:
            edge_weight = np.ones((e,), dtype=np.float32)
        else:
            edge_weight = np.asarray(edge_weight, dtype=np.float32)
        cap = e if edge_buffer_size is None else int(edge_buffer_size)
        assert cap >= e, f"edge buffer {cap} < num edges {e}"
        pad = cap - e
        if pad:
            row = np.concatenate([row, np.zeros(pad, np.int32)])
            col = np.concatenate([col, np.zeros(pad, np.int32)])
            edge_weight = np.concatenate([edge_weight, np.zeros(pad, np.float32)])
        return Graph(
            row=jnp.asarray(row),
            col=jnp.asarray(col),
            edge_weight=jnp.asarray(edge_weight),
            num_edges=jnp.asarray(e, jnp.int32),
            num_nodes=int(num_nodes),
        )

    def to_dense(self) -> jax.Array:
        """``[N, N]`` dense adjacency (tests/debug only — never the hot path).

        Equivalent of the reference `to_dense_adj` (`src/utils.py:102-113`).
        Duplicate edges accumulate, padding contributes 0.
        """
        n = self.num_nodes
        w = jnp.where(self.edge_mask, self.edge_weight, 0.0)
        dense = jnp.zeros((n, n), dtype=w.dtype)
        return dense.at[self.row, self.col].add(w)
