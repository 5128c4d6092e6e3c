"""Host-side (NumPy) graph topology construction.

The reference performs coalescing/self-loop/undirected manipulation on device
tensors by densifying to ``[B, N, N]`` every call (`src/utils.py:16-113`).
Topology work is inherently irregular and happens once per graph (or once per
rewiring epoch), so in the TPU design it lives on the host: plain NumPy here,
with a C++ fast path for large graphs in ``graphax.native``. The output is a
static-shape :class:`graphax.sparse.Graph` ready for jit.

Semantics match the reference exactly where it matters:
- duplicate edges accumulate their weights (the reference's COO→dense→COO
  round-trip sums duplicates);
- `add_remaining_self_loops` ADDS `fill_value` to the diagonal (an existing
  self-loop weight w becomes w + fill) — `src/utils.py:16-42`;
- `to_undirected` unions edge sets, deduplicating (`src/utils.py:72-76`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from graphax.sparse.graph import Graph


Edges = Tuple[np.ndarray, np.ndarray, np.ndarray]  # (row, col, weight)


def _as_edges(row, col, weight=None) -> Edges:
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    if weight is None:
        weight = np.ones(row.shape[0], dtype=np.float64)
    else:
        weight = np.asarray(weight, dtype=np.float64)
    return row, col, weight


def coalesce(row, col, weight=None, num_nodes: Optional[int] = None) -> Edges:
    """Sort edges by (row, col) and sum duplicate weights."""
    row, col, weight = _as_edges(row, col, weight)
    from graphax import native

    fast = native.coalesce(row, col, weight) if native.available() else None
    if fast is not None:
        return fast
    n = int(num_nodes if num_nodes is not None else (max(row.max(initial=-1), col.max(initial=-1)) + 1))
    key = row * n + col
    uniq, inv = np.unique(key, return_inverse=True)
    w = np.zeros(uniq.shape[0], dtype=np.float64)
    np.add.at(w, inv, weight)
    return (uniq // n).astype(np.int64), (uniq % n).astype(np.int64), w


def add_self_loops(row, col, weight=None, fill_value: float = 1.0,
                   num_nodes: Optional[int] = None) -> Edges:
    """Add `fill_value` to every diagonal entry (creating loops where absent).

    Twin of `add_remaining_self_loops` (`src/utils.py:16-42`), which does a
    dense add of `fill_value * I` and re-sparsifies.
    """
    row, col, weight = _as_edges(row, col, weight)
    n = int(num_nodes if num_nodes is not None else (max(row.max(initial=-1), col.max(initial=-1)) + 1))
    loops = np.arange(n, dtype=np.int64)
    row = np.concatenate([row, loops])
    col = np.concatenate([col, loops])
    weight = np.concatenate([weight, np.full(n, float(fill_value))])
    return coalesce(row, col, weight, n)


def remove_self_loops(row, col, weight=None) -> Edges:
    """Drop diagonal entries (`src/utils.py:44-70`)."""
    row, col, weight = _as_edges(row, col, weight)
    keep = row != col
    return row[keep], col[keep], weight[keep]


def to_undirected(row, col, num_nodes: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Union with the reversed edge set, deduplicated (`src/utils.py:72-76`).

    Weights are dropped, as in the reference (it returns indices only).
    """
    r = np.concatenate([row, col]).astype(np.int64)
    c = np.concatenate([col, row]).astype(np.int64)
    n = int(num_nodes if num_nodes is not None else (max(r.max(initial=-1), c.max(initial=-1)) + 1))
    from graphax import native

    fast = native.to_undirected(np.asarray(row, np.int64),
                                np.asarray(col, np.int64), n) \
        if native.available() else None
    if fast is not None:
        return fast
    key = np.unique(r * n + c)
    return (key // n).astype(np.int64), (key % n).astype(np.int64)


def dense_to_edges(adj: np.ndarray) -> Edges:
    """Nonzero entries of a dense adjacency (`src/utils.py:78-95` intent)."""
    adj = np.asarray(adj)
    row, col = np.nonzero(adj)
    return row.astype(np.int64), col.astype(np.int64), adj[row, col].astype(np.float64)


def full_adjacency(num_nodes: int) -> Tuple[np.ndarray, np.ndarray]:
    """All N² (row, col) pairs (`src/utils.py:271-277`)."""
    row = np.repeat(np.arange(num_nodes, dtype=np.int64), num_nodes)
    col = np.tile(np.arange(num_nodes, dtype=np.int64), num_nodes)
    return row, col


def two_hop(row, col, num_nodes: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Edge set of A + A² (dedup, no weights) — the reference's
    `get_two_hop`/PyG `TwoHop` (`src/graph_rewiring.py:34-39`)."""
    import scipy.sparse as sp  # local import; preprocessing only

    row, col, w = _as_edges(row, col, None)
    n = int(num_nodes if num_nodes is not None else (max(row.max(initial=-1), col.max(initial=-1)) + 1))
    a = sp.coo_matrix((np.ones_like(w), (row, col)), shape=(n, n)).tocsr()
    a2 = ((a + a @ a) > 0).tocoo()
    return a2.row.astype(np.int64), a2.col.astype(np.int64)


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def build_graph(row, col, num_nodes: int, edge_weight=None,
                self_loop_weight: float = 0.0, make_undirected: bool = False,
                pad_multiple: int = 128,
                extra_edge_capacity: int = 0,
                tiles: bool = False,
                strategy: str = "auto",
                dense_threshold: int = 20_000,
                hubs: bool = True) -> Graph:
    """One-stop host-side pipeline: [undirected] → [self-loops] → coalesce →
    sort by (row, col) → pad to a static bucket → Graph.

    ``pad_multiple`` buckets the edge buffer so jit caches stay warm across
    graphs of similar size; ``extra_edge_capacity`` reserves headroom for
    rewiring (edges added at runtime without reallocation).
    """
    if make_undirected:
        row, col = to_undirected(row, col, num_nodes)
        edge_weight = None
    if self_loop_weight:
        row, col, edge_weight = add_self_loops(row, col, edge_weight,
                                               self_loop_weight, num_nodes)
    else:
        row, col, edge_weight = coalesce(row, col, edge_weight, num_nodes)
    e = int(row.shape[0])
    cap = round_up(e + int(extra_edge_capacity), pad_multiple)
    g = Graph.from_edges(row, col, num_nodes, edge_weight,
                         edge_buffer_size=cap)
    if strategy == "auto":
        strategy = "dense" if num_nodes <= dense_threshold else "tiled"
    if strategy == "windowed":
        # block-dense layout — node ids should be community-ordered first
        # (graphax.data.community_reorder does both in one step)
        from graphax.kernels.dispatch import attach_windows

        return attach_windows(g)
    if strategy == "tiled" or tiles:
        from graphax.kernels.dispatch import attach_tiles

        g = attach_tiles(g)
        if strategy == "auto" or strategy == "tiled":
            strategy = "tiled"
        if hubs:
            # hub-slab layout for power-law graphs (kernels.hubs) — the
            # cost model declines when the degree distribution doesn't pay
            from graphax.kernels.hubs import attach_hubs

            g = attach_hubs(g)
    import dataclasses as _dc

    return _dc.replace(g, strategy=strategy)
