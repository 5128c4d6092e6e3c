"""Host-side row-tiled edge layout for scatter-free segment reductions.

Layout invariants:
- edges are sorted by ``row`` (``build.build_graph`` coalesces to
  (row, col) order);
- the node range is padded to ``T = ceil(N/tile)`` tiles of ``tile`` rows;
- edges are re-packed into ``B`` blocks of ``block_edges`` slots, each block
  containing only edges whose row lies in a single tile (blocks of one tile
  are consecutive);
- padded slots carry ``local_row = tile`` (one_hot maps it to zero) and a
  False mask.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RowTiles:
    """Static block tables (arrays device-resident, sizes static)."""

    edge_slot: jax.Array    # [B, Eb] int32 — original edge index (pad: 0)
    slot_mask: jax.Array    # [B, Eb] bool — real edge?
    col: jax.Array          # [B, Eb] int32 — column (gather) index
    local_row: jax.Array    # [B, Eb] int32 in [0, tile]; == tile for pads
    tile_idx: jax.Array     # [B] int32 — output tile of each block
    num_tiles: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    block_edges: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    # On a TRANSPOSE layout (tiles_t): [B·Eb] int32 mapping each of MY slots
    # to the row-layout slot holding the same edge — lets the attention
    # backward move per-edge quantities between layouts with one fast gather
    # instead of an E-sized scatter (graphax.kernels.pallas_attention).
    perm_from_row: jax.Array = None

    @property
    def num_blocks(self) -> int:
        return int(self.tile_idx.shape[0])

    @property
    def padded_nodes(self) -> int:
        return self.num_tiles * self.tile


def choose_block_edges(row, num_nodes: int, num_edges: int = None,
                       tile: int = 128,
                       candidates=(384, 512, 640, 768, 1024, 1280, 1536,
                                   1792, 2048, 2560, 3072, 4096),
                       block_overhead_slots: int = 90) -> int:
    """Pick the block size minimizing modeled per-NFE cost.

    Measured on v5e: the E-sized row gather is row-count-bound (~4.9 ns per
    padded slot, width-independent up to 256 lanes) and each Pallas block
    carries a ~0.4 µs fixed cost ≈ the gather time of ~90 slots (r3 block
    sweep, scripts/profile_windowed.py: Eb 256→640 on a 718k-edge residual
    traded 1812 blocks for 113k slots at break-even, and the full-graph
    sweep's 1024-vs-2048 pair reproduces the same ~0.4 µs/block). So
    cost(Eb) = padded_slots(Eb) + 90·blocks(Eb), with
    padded_slots = Σ_tiles ceil(deg_tile/Eb)·Eb. Uniform-degree graphs pick
    the largest Eb with no extra padding; skewed/low-degree graphs (e.g.
    the out-of-window residual) pick a smaller Eb over padding half-empty
    blocks."""
    row = np.asarray(row)
    e = int(num_edges) if num_edges is not None else row.shape[0]
    t = (num_nodes + tile - 1) // tile
    deg = np.bincount(row[:e] // tile, minlength=t)
    best_eb, best_cost = candidates[0], None
    for eb in candidates:
        blocks = np.maximum((deg + eb - 1) // eb, 0)
        slots = int(blocks.sum()) * eb
        cost = slots + block_overhead_slots * int(np.maximum(blocks, 0).sum())
        if best_cost is None or cost < best_cost:
            best_eb, best_cost = eb, cost
    return best_eb


def build_row_tiles(row, col, num_nodes: int, num_edges: int = None,
                    tile: int = 128, block_edges: int = None) -> RowTiles:
    """Build the block tables from host (or device) edge arrays sorted by
    row. ``num_edges`` masks trailing padding in the input buffers."""
    import jax.numpy as jnp

    row = np.asarray(row)
    col_np = np.asarray(col)
    e = int(num_edges) if num_edges is not None else row.shape[0]
    row, col_np = row[:e], col_np[:e]
    assert (np.diff(row) >= 0).all(), "edges must be sorted by row"
    if block_edges is None:
        block_edges = choose_block_edges(row, num_nodes, tile=tile)

    t = (num_nodes + tile - 1) // tile
    from graphax import native

    if native.available():
        fast = native.row_tiles(row, col_np, num_nodes, tile, block_edges)
        if fast is not None:
            edge_slot_n, col_n, local_row_n, tile_idx_n = fast
            mask = edge_slot_n >= 0
            return RowTiles(
                edge_slot=jnp.asarray(np.where(mask, edge_slot_n, 0)
                                      .astype(np.int32)),
                slot_mask=jnp.asarray(mask),
                col=jnp.asarray(col_n.astype(np.int32)),
                local_row=jnp.asarray(local_row_n.astype(np.int32)),
                tile_idx=jnp.asarray(tile_idx_n.astype(np.int32)),
                num_tiles=t, tile=tile, block_edges=block_edges,
                num_nodes=int(num_nodes))
    tile_of_edge = row // tile
    # block boundaries: every `block_edges` edges AND every tile change
    counts = np.bincount(tile_of_edge, minlength=t)
    blocks = []
    start = 0
    for ti in range(t):
        d = counts[ti]
        off = 0
        while off < d:
            take = min(block_edges, d - off)
            blocks.append((ti, start + off, take))
            off += take
        start += d
    b = max(len(blocks), 1)

    edge_slot = np.zeros((b, block_edges), np.int32)
    slot_mask = np.zeros((b, block_edges), bool)
    col_b = np.zeros((b, block_edges), np.int32)
    local_row = np.full((b, block_edges), tile, np.int32)
    tile_idx = np.zeros((b,), np.int32)
    for i, (ti, s, take) in enumerate(blocks):
        sl = np.arange(s, s + take)
        edge_slot[i, :take] = sl
        slot_mask[i, :take] = True
        col_b[i, :take] = col_np[sl]
        local_row[i, :take] = row[sl] - ti * tile
        tile_idx[i] = ti

    return RowTiles(
        edge_slot=jnp.asarray(edge_slot), slot_mask=jnp.asarray(slot_mask),
        col=jnp.asarray(col_b), local_row=jnp.asarray(local_row),
        tile_idx=jnp.asarray(tile_idx), num_tiles=t, tile=tile,
        block_edges=block_edges, num_nodes=int(num_nodes))
