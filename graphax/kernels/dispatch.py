"""Routing between the XLA segment path and the MXU-tiled fast path.

A Graph that carries a :class:`RowTiles` layout (attached by
``graphax.sparse.build.build_graph(..., tiles=True)`` or
:func:`attach_tiles`) takes the scatter-free path; otherwise the plain
segment ops run — numerically interchangeable, pinned by tests."""

from __future__ import annotations


import jax.numpy as jnp

from graphax.kernels.segment_mxu import (
    tiled_segment_softmax, tiled_spmm, tiled_spmm_multihead,
)
from graphax.kernels.tiles import RowTiles, build_row_tiles
from graphax.sparse import ops as xla_ops


def attach_tiles(graph, tile: int = 128, block_edges: int = None,
                 transpose: bool = True):
    """Return a copy of ``graph`` carrying the row-tiled layout (host-side
    preprocessing; edge buffers must be sorted by row).

    With ``transpose`` (default) a second, col-tiled layout is attached as
    ``tiles_t`` — the transpose-SpMM tables the Pallas custom_vjp uses for
    ``dx = Aᵀg`` (graphax.kernels.pallas_tiled). Its ``edge_slot`` is
    remapped to index the ORIGINAL edge order."""
    import dataclasses

    import numpy as np

    tiles = build_row_tiles(graph.row, graph.col, graph.num_nodes,
                            num_edges=int(graph.num_edges), tile=tile,
                            block_edges=block_edges)
    tiles_t = None
    if transpose:
        e = int(graph.num_edges)
        row = np.asarray(graph.row)[:e]
        col = np.asarray(graph.col)[:e]
        order = np.lexsort((row, col)).astype(np.int32)
        tt = build_row_tiles(col[order], row[order], graph.num_nodes,
                             num_edges=e, tile=tile,
                             block_edges=block_edges)
        # edge_slot currently indexes the col-sorted order; remap to the
        # original buffer so one [E] value vector serves both layouts
        import jax.numpy as _jnp

        remapped = order[np.asarray(tt.edge_slot)]
        t_mask = np.asarray(tt.slot_mask)
        remapped = np.where(t_mask, remapped, 0).astype(np.int32)
        # slot permutation row-layout -> transpose-layout: transpose slot j
        # holds edge remapped[j]; find the row-layout slot of that edge
        r_slot = np.asarray(tiles.edge_slot).reshape(-1)
        r_mask = np.asarray(tiles.slot_mask).reshape(-1)
        inv = np.zeros(max(e, 1), np.int64)
        inv[r_slot[r_mask]] = np.nonzero(r_mask)[0]
        perm = np.where(t_mask, inv[remapped].reshape(t_mask.shape), 0)
        tiles_t = dataclasses.replace(
            tt, edge_slot=_jnp.asarray(remapped),
            perm_from_row=_jnp.asarray(perm.reshape(-1).astype(np.int32)))
    return dataclasses.replace(graph, tiles=tiles, tiles_t=tiles_t)


def attach_windows(graph, window: int = 512, tile: int = 128,
                   block_edges: int = 2048, hubs=True):
    """Return a copy of ``graph`` carrying the windowed (block-dense)
    layout plus the row-tiled layouts (host-side preprocessing; edge
    buffers must be sorted by row, node ids ideally community-ordered —
    see ``graphax.kernels.windows.community_order``).

    The windowed layout serves the laplacian SpMM; the row tiles keep every
    other op (segment softmax, attention SpMM) on the fast path."""
    import dataclasses

    import numpy as np

    from graphax.kernels.windows import build_window_tiles

    g = attach_tiles(graph, tile=tile)
    e = int(graph.num_edges)
    row = np.asarray(graph.row)[:e]
    col = np.asarray(graph.col)[:e]
    wt = build_window_tiles(row, col, graph.num_nodes, tile=tile,
                            window=window, block_edges=block_edges,
                            hubs=hubs)
    return dataclasses.replace(g, windows=wt, strategy="windowed")


def spmm_auto(graph, edge_values, x):
    """A @ x with per-edge ``edge_values`` (must be 0 on padding)."""
    if graph.tiles is not None:
        return tiled_spmm(edge_values, x, graph.tiles)
    return xla_ops.spmm(graph.row, graph.col, edge_values, x,
                        graph.num_nodes)


def segment_softmax_auto(graph, scores, norm_index_is_row: bool, mask=None):
    """Segment softmax over the attention norm index. The tiled layout is
    keyed on ``row``, so the fast path applies when normalizing over rows;
    col-normalized configs fall back to the XLA path (a col-sorted second
    layout is a planned extension)."""
    if graph.tiles is not None and norm_index_is_row:
        return tiled_segment_softmax(scores, graph.row, graph.tiles,
                                     mask=mask)
    index = graph.row if norm_index_is_row else graph.col
    return xla_ops.segment_softmax(scores, index, graph.num_nodes, mask=mask)


def squareplus_auto(graph, scores, norm_index_is_row: bool, mask=None,
                    eps: float = 1e-16):
    """Square-plus normalization (global max shift) on the fast path."""
    if graph.tiles is None or not norm_index_is_row:
        index = graph.row if norm_index_is_row else graph.col
        return xla_ops.squareplus_norm(scores, index, graph.num_nodes,
                                       mask=mask)
    from graphax.kernels.segment_mxu import tiled_segment_sum

    neg = jnp.asarray(-1e30, scores.dtype)
    s = scores if mask is None else jnp.where(mask[:, None], scores, neg)
    gmax = jnp.max(s)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    out = s - gmax
    out = (out + jnp.sqrt(out * out + 4.0)) / 2.0
    if mask is not None:
        out = jnp.where(mask[:, None], out, 0.0)
    denom = tiled_segment_sum(out, graph.tiles)[graph.row]
    return out / (denom + eps)


def attention_spmm_auto(graph, attention, x, mask=None):
    """Mean-over-heads attention SpMM."""
    mean_att = attention.mean(axis=1)
    if mask is not None:
        mean_att = jnp.where(mask, mean_att, 0.0)
    return spmm_auto(graph, mean_att, x)


def spmm_multihead_auto(graph, att, v):
    if graph.tiles is not None:
        return tiled_spmm_multihead(att, v, graph.tiles)
    return xla_ops.spmm_multihead(graph.row, graph.col, att, v,
                                  graph.num_nodes)
