"""k-nearest-neighbor graph rewiring (the BLEND graph-evolution path).

Twin of `KNN`/`apply_KNN` (`src/graph_rewiring.py:122-161`), which brute-
forces all-pairs distances with pykeops LazyTensors on CUDA. Here the
all-pairs sweep is a blocked ‖xᵢ−xⱼ‖² + `lax.top_k` on device — MXU matmuls
for the cross terms — and the new edge list is assembled host-side into a
fresh static Graph.

Reference quirks kept: all-zero feature rows are pushed to +inf coordinates
so they neighbor nothing (`:128-131`); each node contributes k outgoing
edges (row = node, col = neighbor, self-match included as in argKmin);
optional symmetrization unions the reverse edges (`:144-145`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def knn_graph(x, k: int, *, sym: bool = False, block_size: int = 4096
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k nearest neighbors in embedding space. Returns host (row, col)."""
    n = x.shape[0]
    x = jnp.asarray(x)
    zero_rows = jnp.all(x == 0, axis=-1)
    big = jnp.asarray(1e30, x.dtype)
    x = jnp.where(zero_rows[:, None], big, x)

    sq = jnp.sum(x * x, axis=-1)

    @jax.jit
    def block_topk(xb, sqb):
        # D[i, j] = ‖xb_i‖² + ‖x_j‖² − 2·xb_i·x_j
        cross = xb @ x.T
        d = sqb[:, None] + sq[None, :] - 2.0 * cross
        _, idx = jax.lax.top_k(-d, k)
        return idx

    cols = []
    for start in range(0, n, block_size):
        end = min(start + block_size, n)
        idx = block_topk(x[start:end], sq[start:end])
        cols.append(np.asarray(idx))
    col = np.concatenate(cols, axis=0).reshape(-1)
    row = np.repeat(np.arange(n, dtype=np.int64), k)
    if sym:
        from graphax.sparse.build import to_undirected

        row, col = to_undirected(row, col, n)
    return row.astype(np.int64), col.astype(np.int64)


def rewire_graph_with_edges(graph, row, col, self_loop_weight: float = 0.0,
                            keep_capacity: bool = True):
    """Host-side rebuild of a Graph with new topology. Keeps the old edge
    buffer capacity when the new edge count fits (so jit caches stay warm);
    grows to the next bucket otherwise."""
    from graphax.sparse import build

    if self_loop_weight:
        row, col, w = build.add_self_loops(row, col, None, self_loop_weight,
                                           graph.num_nodes)
    else:
        row, col, w = build.coalesce(row, col, None, graph.num_nodes)
    e = len(row)
    cap = graph.edge_buffer_size if (keep_capacity
                                     and e <= graph.edge_buffer_size) \
        else build.round_up(e, 128)
    from graphax.sparse.graph import Graph
    import dataclasses

    g2 = Graph.from_edges(row, col, graph.num_nodes, w, edge_buffer_size=cap)
    g2 = dataclasses.replace(g2, strategy=graph.strategy)
    if graph.tiles is not None:
        from graphax.kernels.dispatch import attach_tiles

        g2 = attach_tiles(g2, tile=graph.tiles.tile,
                          block_edges=graph.tiles.block_edges)
    return g2


def apply_knn(cfg, model, params, state, data, *, x=None, x2=None):
    """`apply_KNN` (`src/graph_rewiring.py:151-161`): embed with the raw
    features, the encoder output (T0), or the full ODE output (TN), then
    kNN-rewire. Returns the new Graph."""
    feat = data.x if x is None else x
    if cfg.rewire_KNN_T == "raw":
        z = feat
    elif cfg.rewire_KNN_T == "T0":
        z, _ = model.encode(params, state, feat, train=False,
                            pos_encoding=data.pos_encoding,
                            apply_dropout=False)
    elif cfg.rewire_KNN_T == "TN":
        z, _, _ = model.forward_ode(params, state, data.graph, feat,
                                    train=False,
                                    pos_encoding=data.pos_encoding, x2=x2)
    else:
        raise ValueError(f"rewire_KNN_T must be raw|T0|TN, got "
                         f"{cfg.rewire_KNN_T!r}")
    row, col = knn_graph(z, cfg.rewire_KNN_k, sym=cfg.rewire_KNN_sym)
    return rewire_graph_with_edges(data.graph, row, col,
                                   self_loop_weight=cfg.self_loop_weight)
