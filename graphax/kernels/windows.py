"""Host-side windowed (cluster-dense) edge layout.

Motivation (measured, scripts/profile_attention_rhs.py): at ogbn-arxiv scale
the random row gather ``x[col]`` is ~10.7 ms of the 11.7 ms tiled SpMM RHS —
the TPU fetches a full sublane granule per random row, so the gather runs at
~82 GB/s *useful* bandwidth and is width-independent. On a uniform-random
graph that is the roofline. Real graphs are community-structured: after
reordering node ids by community (``graphax.native.partition_bfs`` labels),
most edges' source lies in a narrow contiguous id range near the row tile.

This layout exploits that: per 128-row output tile, pick the aligned
``window``-wide column range covering the most edges. Edges inside the
window are served by an MXU one-hot expansion against the window slab —
``vals = (w ⊙ onehot(col_local)) @ x[ws : ws+W]`` — a *sequential* slab read
shared by the whole tile plus pure matmul FLOPs (~2·W·D per edge ≈ 1.7 ns at
W=512 on v5e bf16, vs ~3.9 ns for the random gather). Edges outside the
window fall back to the gather-based :class:`RowTiles` path. The split is
static per graph (rebuilt on rewiring, like the row tiles).

Replaces nothing in the reference (it densifies to [B,N,N] per call,
`src/function_laplacian_diffusion.py:39-58`); this is the TPU-native answer
to torch_sparse SpMM for community-structured graphs.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from graphax.kernels.tiles import RowTiles, build_row_tiles


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowTiles:
    """Blocked tables for the in-window edges + a residual gather layout.

    In-window blocks mirror :class:`RowTiles` (consecutive blocks per output
    tile, padded slots masked) with the gather column replaced by a
    window-local column ``lcol`` and a per-block aligned window id."""

    edge_slot: jax.Array   # [Bw, Eb] int32 — original edge index (pad: 0)
    slot_mask: jax.Array   # [Bw, Eb] bool
    lcol: jax.Array        # [Bw, Eb] int32 in [0, W]; == W on padded slots
    local_row: jax.Array   # [Bw, Eb] int32 in [0, tile]; == tile on pads
    tile_idx: jax.Array    # [Bw] int32 — output tile of each block
    win_id: jax.Array      # [Bw] int32 — aligned window index of each block
    tile_win: jax.Array    # [T] int32 — best aligned window of each row tile
    dense_mask: jax.Array  # [T, tile, W] int8 — 1 where the cell holds a
    #                        real edge (int8, not bool: Mosaic loads i8
    #                        blocks ~0.9 ms/NFE faster at arxiv scale)
    residual: RowTiles     # gather-path layout for out-of-window edges
    residual_t: RowTiles   # transpose layout of the SAME residual subset
    window: int = dataclasses.field(metadata=dict(static=True))
    num_windows: int = dataclasses.field(metadata=dict(static=True))
    num_tiles: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    block_edges: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    # optional hub extraction from the residual (kernels.hubs.HubTiles built
    # on the residual subset): on real community+hub graphs the out-of-window
    # edges concentrate on a few global hub columns — those become dense
    # [T, tile, H] blocks against the x[hub_ids] slab, and only the
    # hub-free remainder pays the granule-bound gather. The FULL residual
    # pair above is kept for the windowed-attention path (scores need every
    # residual edge in one layout).
    hub: object = None

    @property
    def num_blocks(self) -> int:
        return int(self.tile_idx.shape[0])

    @property
    def padded_nodes(self) -> int:
        return self.num_tiles * self.tile

    @property
    def in_window_edges(self) -> int:
        return int(np.asarray(jax.device_get(self.slot_mask)).sum())


def community_order(row, col, num_nodes: int, window: int = 512):
    """Node permutation grouping community labels into contiguous id runs.

    Labels come from the native greedy region-growing partitioner with
    capacity = ``window`` so each community fits one aligned window. Returns
    ``perm`` with ``perm[old_id] = new_id``."""
    from graphax import native

    num_parts = max((num_nodes + window - 1) // window, 1)
    labels, _ = native.partition_bfs(np.asarray(row, np.int64),
                                     np.asarray(col, np.int64),
                                     num_nodes, num_parts, window)
    order = np.argsort(labels, kind="stable")      # new_id -> old_id
    perm = np.empty(num_nodes, np.int64)
    perm[order] = np.arange(num_nodes)
    return perm


def build_window_tiles(row, col, num_nodes: int, num_edges: int = None,
                       tile: int = 128, window: int = 512,
                       block_edges: int = 2048,
                       hubs: bool = True) -> WindowTiles:
    """Build the windowed layout from row-sorted host edge arrays."""
    row = np.asarray(row)
    col = np.asarray(col)
    e = int(num_edges) if num_edges is not None else row.shape[0]
    row, col = row[:e], col[:e]
    assert (np.diff(row) >= 0).all(), "edges must be sorted by row"
    assert window % tile == 0, "window must be a multiple of the row tile"

    t = (num_nodes + tile - 1) // tile
    num_windows = (num_nodes + window - 1) // window

    # best aligned window per row tile: mode of col // window
    tile_of_edge = row // tile
    win_of_edge = col // window
    flat = tile_of_edge * num_windows + win_of_edge
    counts = np.bincount(flat, minlength=t * num_windows) \
        .reshape(t, num_windows)
    best_win = counts.argmax(axis=1)                      # [T]

    in_win = win_of_edge == best_win[tile_of_edge]
    idx_in = np.nonzero(in_win)[0]
    idx_res = np.nonzero(~in_win)[0]

    # ---- in-window blocks (consecutive per tile, like RowTiles) ----------
    r_in, c_in = row[idx_in], col[idx_in]
    t_in = r_in // tile
    tcounts = np.bincount(t_in, minlength=t)
    blocks = []
    start = 0
    for ti in range(t):
        d = tcounts[ti]
        off = 0
        while off < d:
            take = min(block_edges, d - off)
            blocks.append((ti, start + off, take))
            off += take
        start += d
    b = max(len(blocks), 1)

    edge_slot = np.zeros((b, block_edges), np.int32)
    slot_mask = np.zeros((b, block_edges), bool)
    lcol = np.full((b, block_edges), window, np.int32)
    local_row = np.full((b, block_edges), tile, np.int32)
    tile_idx = np.zeros((b,), np.int32)
    win_id = np.zeros((b,), np.int32)
    for i, (ti, s, take) in enumerate(blocks):
        sl = np.arange(s, s + take)
        orig = idx_in[sl]
        edge_slot[i, :take] = orig
        slot_mask[i, :take] = True
        lcol[i, :take] = c_in[sl] - best_win[ti] * window
        local_row[i, :take] = r_in[sl] - ti * tile
        tile_idx[i] = ti
        win_id[i] = best_win[ti]

    # ---- residual edges: plain gather layout pair, slots remapped --------
    # (forward + transpose of the SAME subset, so the per-NFE residual SpMM
    # can ride the existing custom-vjp `pallas_tiled.spmm_pallas`)
    import jax.numpy as jnp

    def _residual_layout(r, c, subset_ids):
        # auto-size the residual blocks: the residual subset is ~3-4x
        # sparser per tile than the full graph, so inheriting the in-window
        # block size would pad (and gather) ~4x more slots than needed
        lt = build_row_tiles(r, c, num_nodes, tile=tile, block_edges=None)
        m = np.asarray(lt.slot_mask)
        if subset_ids.size:
            remapped = subset_ids[np.asarray(lt.edge_slot)]
        else:
            remapped = np.zeros(np.asarray(lt.edge_slot).shape, np.int64)
        return dataclasses.replace(
            lt, edge_slot=jnp.asarray(
                np.where(m, remapped, 0).astype(np.int32)))

    r_res, c_res = row[idx_res], col[idx_res]
    res = _residual_layout(r_res, c_res, idx_res)
    ot = np.lexsort((r_res, c_res))
    res_t = _residual_layout(c_res[ot], r_res[ot], idx_res[ot])

    # hub extraction from the residual: SpMM-only fast path (the attention
    # path keeps the full residual pair above)
    hub_tiles = None
    if hubs and idx_res.size:
        from graphax.kernels.hubs import build_hub_tiles_subset

        hub_tiles = build_hub_tiles_subset(r_res, c_res, idx_res, num_nodes,
                                           tile=tile,
                                           force=(hubs == "force"))

    # static cell-occupancy mask of the in-window dense blocks (edges are
    # coalesced, so cells are unique) — serves the windowed attention path
    # (score masking before softmax) at zero per-forward cost
    dense_mask = np.zeros((t, tile, window), np.int8)
    dense_mask[t_in, r_in - t_in * tile, c_in - best_win[t_in] * window] = 1

    return WindowTiles(
        edge_slot=jnp.asarray(edge_slot), slot_mask=jnp.asarray(slot_mask),
        lcol=jnp.asarray(lcol), local_row=jnp.asarray(local_row),
        tile_idx=jnp.asarray(tile_idx), win_id=jnp.asarray(win_id),
        tile_win=jnp.asarray(best_win.astype(np.int32)),
        dense_mask=jnp.asarray(dense_mask),
        residual=res, residual_t=res_t, hub=hub_tiles, window=window,
        num_windows=num_windows, num_tiles=t,
        tile=tile, block_edges=block_edges, num_nodes=int(num_nodes))


def blocked_window_values(edge_values, wt: WindowTiles):
    """[E] edge values → (in-window [Bw, Eb], residual [Br, Eb],
    residual-transpose [Bt, Eb]) blocks — three views of one vector, so
    autodiff sums their cotangents back into the [E] array."""
    import jax.numpy as jnp

    win = jnp.where(wt.slot_mask, edge_values[wt.edge_slot], 0)
    res = jnp.where(wt.residual.slot_mask,
                    edge_values[wt.residual.edge_slot], 0)
    res_t = jnp.where(wt.residual_t.slot_mask,
                      edge_values[wt.residual_t.edge_slot], 0)
    return win, res, res_t
