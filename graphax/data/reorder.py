"""Community reordering of a dataset for the windowed SpMM strategy.

``community_reorder`` relabels node ids so that nodes in the same community
(native greedy region-growing partition, capacity = ``window``) occupy a
contiguous id range, then rebuilds the graph with the block-dense windowed
edge layout attached (``graphax.kernels.windows``). After reordering, most
edges of a community-structured graph land inside their row tile's best
aligned column window, so the laplacian SpMM runs as batched MXU matmuls
against sequential window slabs instead of a granule-bound random row
gather.

This is a host-side, once-per-dataset preprocessing step — the TPU-native
analog of locality-improving graph reordering; the reference has no
equivalent (it densifies to [B,N,N] per call,
`src/function_laplacian_diffusion.py:39-58`). The reordered dataset is the
same learning task up to a node permutation: features, labels, split masks,
and positional encodings are permuted consistently with the edge endpoints.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from graphax.data.container import GraphData
from graphax.sparse.graph import Graph


def community_reorder(data: GraphData, window: int = 512, tile: int = 128,
                      block_edges: int = 2048,
                      min_in_window_frac: float = 0.0) -> GraphData:
    """Return ``data`` with community-contiguous node ids and a windowed
    (block-dense) graph layout attached (``graph.strategy == 'windowed'``).

    Args:
      data: dataset to reorder (edge buffers may be padded; only the real
        ``num_edges`` prefix is used).
      window: aligned column-window width — also the community capacity of
        the partitioner. Must be a multiple of ``tile``.
      tile: output row-tile height of the blocked layouts.
      block_edges: edge slots per in-window block.
      min_in_window_frac: if, after reordering, fewer than this fraction of
        edges land in-window (graph has no community structure — the
        windowed strategy would mostly pay its residual gather path plus
        block overhead), keep the reordered ids but attach the row-tiled
        layout instead.
    """
    import jax.numpy as jnp

    from graphax.kernels.dispatch import attach_tiles, attach_windows
    from graphax.kernels.windows import community_order

    tile = min(tile, window)  # layout requires tile | window
    g = data.graph
    n = g.num_nodes
    e = int(g.num_edges)
    row = np.asarray(g.row)[:e]
    col = np.asarray(g.col)[:e]
    weight = np.asarray(g.edge_weight)[:e]

    perm = community_order(row, col, n, window=window)  # perm[old] = new
    r2, c2 = perm[row], perm[col]
    order = np.lexsort((c2, r2))  # windowed layout wants row-sorted edges
    new_graph = Graph.from_edges(r2[order], c2[order], n, weight[order],
                                 edge_buffer_size=g.edge_buffer_size)
    new_graph = attach_windows(new_graph, window=window, tile=tile,
                               block_edges=block_edges)
    if (min_in_window_frac > 0 and e > 0
            and new_graph.windows.in_window_edges / e < min_in_window_frac):
        from graphax.kernels.hubs import attach_hubs

        new_graph = dataclasses.replace(
            attach_hubs(attach_tiles(
                Graph.from_edges(r2[order], c2[order], n, weight[order],
                                 edge_buffer_size=g.edge_buffer_size),
                tile=tile), tile=tile),
            strategy="tiled")

    inv = np.argsort(perm)  # inv[new_id] = old_id

    def permute_nodes(a):
        return None if a is None else jnp.asarray(np.asarray(a)[inv])

    return dataclasses.replace(
        data, graph=new_graph,
        x=permute_nodes(data.x), y=permute_nodes(data.y),
        train_mask=permute_nodes(data.train_mask),
        val_mask=permute_nodes(data.val_mask),
        test_mask=permute_nodes(data.test_mask),
        pos_encoding=permute_nodes(data.pos_encoding))
