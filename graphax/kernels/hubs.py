"""Hub-slab SpMM: dense operator blocks over the highest-degree columns.

Motivation: the tiled SpMM's cost at arxiv scale is the granule-bound
random row gather ``x[col]`` (~3.9 ns/edge on v5e, width-independent — see
`graphax.kernels.windows` header). On power-law graphs (citation networks
like ogbn-arxiv) a few hundred hub nodes account for a large fraction of
all gather targets. This layout routes those edges through a dense
operator instead:

- host-side, pick the top-``H`` columns by in-degree (``build_hub_tiles``
  models the tradeoff and picks H, or returns None when hubs don't pay);
- ONCE per forward, densify the hub edges' values into ``[T, tile, H]``
  blocks (reusing the windowed strategy's Pallas densify kernel);
- per solver evaluation: ``hs = x[hub_ids]`` (one tiny H-row gather), then
  ``out += reshape(dense, [T·tile, H]) @ hs`` — ONE large MXU matmul with
  a shared right-hand side, streaming the blocks at full HBM bandwidth
  instead of paying the per-edge gather granule;
- the remaining (non-hub) edges ride the existing custom-vjp gather SpMM
  on their own RowTiles pair.

Numerically exact (cells are disjoint; f32 accumulation in the matmul).
Replaces nothing in the reference (it densifies the FULL [N, N] operator
per call, `src/function_laplacian_diffusion.py:39-58`); this is the
TPU-native answer for scale-free graphs, complementing the windowed
strategy's answer for community-structured ones.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from graphax.kernels.tiles import RowTiles, build_row_tiles


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HubTiles:
    """Blocked tables for hub edges + a gather layout for the rest.

    Hub blocks mirror the windowed in-window blocks: per output row tile,
    consecutive blocks of hub edges with ``lcol`` = the hub's RANK (its row
    in the ``[H, D]`` hub slab ``x[hub_ids]``)."""

    hub_ids: jax.Array     # [H] int32 — node ids of the hub columns
    edge_slot: jax.Array   # [Bh, Eb] int32 — original edge index (pad: 0)
    slot_mask: jax.Array   # [Bh, Eb] bool
    lcol: jax.Array        # [Bh, Eb] int32 in [0, H]; == H on padded slots
    local_row: jax.Array   # [Bh, Eb] int32 in [0, tile]; == tile on pads
    tile_idx: jax.Array    # [Bh] int32 — output tile of each block
    rest: RowTiles         # gather-path layout for non-hub edges
    rest_t: RowTiles       # transpose layout of the SAME non-hub subset
    hub_size: int = dataclasses.field(metadata=dict(static=True))
    num_tiles: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def hub_edges(self) -> int:
        return int(np.asarray(jax.device_get(self.slot_mask)).sum())


# measured v5e constants for the H-selection cost model (the choice is a
# shallow optimum — being 2x off on either constant shifts H by at most one
# candidate step). The gather cost is per padded SLOT of the row-tiled
# layout, not per edge: padded slots fetch a granule like real ones
# (measured: removing 30% of edges without changing the slot count leaves
# the gather time identical).
GATHER_NS_PER_SLOT = 4.3
GATHER_NS_PER_EDGE = GATHER_NS_PER_SLOT  # back-compat alias
HBM_GBPS = 520.0  # measured stream peak (bench.py measure_peaks)


def _layout_slots(row, num_nodes: int, tile: int) -> int:
    """Padded gather slots of the auto-sized row-tiled layout for these
    edges — what the tiled SpMM actually pays per NFE."""
    from graphax.kernels.tiles import choose_block_edges

    t = (num_nodes + tile - 1) // tile
    deg = np.bincount(row // tile, minlength=t)
    eb = choose_block_edges(row, num_nodes, tile=tile)
    return int((np.maximum((deg + eb - 1) // eb, 0)).sum()) * eb


def build_hub_tiles(row, col, num_nodes: int, num_edges: int = None,
                    tile: int = 128, candidates=(128, 256, 512, 1024),
                    dtype_bytes: int = 2, block_edges: int = 2048,
                    force: bool = False):
    """Pick H from ``candidates`` maximizing modeled per-NFE gain
    (covered_edges·t_gather − T·tile·H·bytes/HBM); None when no H pays.

    Edge buffers must be sorted by row (``build.build_graph`` order)."""
    row = np.asarray(row)
    col = np.asarray(col)
    e = int(num_edges) if num_edges is not None else row.shape[0]
    return _build_hub_tiles(row[:e], col[:e], np.arange(e, dtype=np.int64),
                            num_nodes, tile, candidates, dtype_bytes,
                            block_edges, force=force)


def build_hub_tiles_subset(row, col, edge_ids, num_nodes: int,
                           tile: int = 128,
                           candidates=(128, 256, 512, 1024),
                           dtype_bytes: int = 2, block_edges: int = 2048,
                           force: bool = False):
    """Hub layout over a SUBSET of a graph's edges (e.g. the windowed
    strategy's out-of-window residual). ``edge_ids[i]`` is the original
    edge index of subset edge i, so the produced ``edge_slot`` tables
    index the full [E] value vector."""
    return _build_hub_tiles(np.asarray(row), np.asarray(col),
                            np.asarray(edge_ids, np.int64), num_nodes,
                            tile, candidates, dtype_bytes, block_edges,
                            force=force)


def _build_hub_tiles(row, col, edge_ids, num_nodes, tile, candidates,
                     dtype_bytes, block_edges, force=False):
    assert (np.diff(row) >= 0).all(), "edges must be sorted by row"

    t = (num_nodes + tile - 1) // tile
    indeg = np.bincount(col, minlength=num_nodes)
    order = np.argsort(indeg)[::-1]                 # hottest cols first

    # slot-aware gain: what matters is how many padded gather SLOTS the
    # rest layout sheds, not how many edges the hubs cover — per-tile
    # padding quantizes to the block size, so moderate coverage can shed
    # nothing (measured; see GATHER_NS_PER_SLOT note)
    slots_full = _layout_slots(row, num_nodes, tile)
    best_h, best_gain = None, 0.0
    for h in candidates:
        if h > num_nodes:
            break
        hub_cols = order[:h]
        is_h = np.zeros(num_nodes, bool)
        is_h[hub_cols] = True
        rest_rows = row[~is_h[col]]
        slots_rest = _layout_slots(rest_rows, num_nodes, tile) \
            if rest_rows.size else 0
        t_saved = (slots_full - slots_rest) * GATHER_NS_PER_SLOT * 1e-9
        t_stream = t * tile * h * dtype_bytes / (HBM_GBPS * 1e9)
        gain = t_saved - t_stream
        if gain > best_gain:
            best_h, best_gain = h, gain
    if best_h is None:
        if not force:
            return None
        best_h = [h for h in candidates if h <= num_nodes][-1]

    h = best_h
    hub_ids = np.sort(order[:h]).astype(np.int64)
    rank = np.full(num_nodes, -1, np.int64)
    rank[hub_ids] = np.arange(h)
    is_hub = rank[col] >= 0
    idx_hub = np.nonzero(is_hub)[0]
    idx_rest = np.nonzero(~is_hub)[0]

    # ---- hub blocks (consecutive per tile) -------------------------------
    import jax.numpy as jnp

    r_h, c_h = row[idx_hub], col[idx_hub]
    t_h = r_h // tile
    tcounts = np.bincount(t_h, minlength=t)
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
    lcol = np.full((b, block_edges), h, np.int32)
    local_row = np.full((b, block_edges), tile, np.int32)
    tile_idx = np.zeros((b,), np.int32)
    for i, (ti, s, take) in enumerate(blocks):
        sl = np.arange(s, s + take)
        orig = edge_ids[idx_hub[sl]]
        edge_slot[i, :take] = orig
        slot_mask[i, :take] = True
        lcol[i, :take] = rank[c_h[sl]]
        local_row[i, :take] = r_h[sl] - ti * tile
        tile_idx[i] = ti

    # ---- rest: gather layout pair with slots remapped to original ids ----
    def _rest_layout(r, c, subset_ids):
        lt = build_row_tiles(r, c, num_nodes, tile=tile, block_edges=None)
        m = np.asarray(lt.slot_mask)
        if subset_ids.size:
            remapped = subset_ids[np.asarray(lt.edge_slot)]
        else:
            remapped = np.zeros(np.asarray(lt.edge_slot).shape, np.int64)
        return dataclasses.replace(
            lt, edge_slot=jnp.asarray(
                np.where(m, remapped, 0).astype(np.int32)))

    r_r, c_r = row[idx_rest], col[idx_rest]
    rest = _rest_layout(r_r, c_r, edge_ids[idx_rest])
    ot = np.lexsort((r_r, c_r))
    rest_t = _rest_layout(c_r[ot], r_r[ot], edge_ids[idx_rest[ot]])

    return HubTiles(
        hub_ids=jnp.asarray(hub_ids.astype(np.int32)),
        edge_slot=jnp.asarray(edge_slot), slot_mask=jnp.asarray(slot_mask),
        lcol=jnp.asarray(lcol), local_row=jnp.asarray(local_row),
        tile_idx=jnp.asarray(tile_idx), rest=rest, rest_t=rest_t,
        hub_size=h, num_tiles=t, tile=tile, num_nodes=int(num_nodes))


def attach_hubs(graph, tile: int = 128, candidates=(128, 256, 512, 1024),
                force: bool = False):
    """Return a copy of ``graph`` carrying the hub layout (None when the
    degree distribution doesn't pay for it). Compose after
    ``dispatch.attach_tiles``."""
    ht = build_hub_tiles(graph.row, graph.col, graph.num_nodes,
                         num_edges=int(graph.num_edges), tile=tile,
                         candidates=candidates, force=force)
    return dataclasses.replace(graph, hubs=ht)


def blocked_hub_values(edge_values, ht: HubTiles):
    """[E] edge values → (hub blocks, rest blocks, rest-transpose blocks) —
    three views of one vector; autodiff sums their cotangents."""
    import jax.numpy as jnp

    hub = jnp.where(ht.slot_mask, edge_values[ht.edge_slot], 0)
    rest = jnp.where(ht.rest.slot_mask, edge_values[ht.rest.edge_slot], 0)
    rest_t = jnp.where(ht.rest_t.slot_mask,
                       edge_values[ht.rest_t.edge_slot], 0)
    return hub, rest, rest_t


def densify_hubs(hub_wb, ht: HubTiles):
    """Blocked hub edge values → dense [T, tile, H] operator blocks (ONCE
    per forward; differentiable via the windowed densify custom-vjp)."""
    import jax.numpy as jnp

    from graphax.kernels.pallas_windows import _make_densify

    f = _make_densify(ht.num_tiles, ht.tile, ht.hub_size)
    t = jnp.zeros(ht.num_tiles, jnp.int32).at[ht.tile_idx].add(1)
    present = t > 0
    return f(hub_wb, ht.lcol, ht.local_row, ht.tile_idx, present)


def spmm_hub(dense_hub, x, ht: HubTiles):
    """Hub contribution: ``[T·tile, H] @ x[hub_ids]`` — one MXU matmul with
    a shared rhs; XLA autodiff covers it (d hub-slab is an H-row
    scatter-add, d dense is gp @ hsᵀ)."""
    import jax.numpy as jnp

    hs = x[ht.hub_ids]                                 # [H, D] tiny gather
    flat = dense_hub.reshape(ht.num_tiles * ht.tile, ht.hub_size)
    out = jnp.matmul(flat, hs.astype(flat.dtype),
                     preferred_element_type=jnp.float32)
    return out[:ht.num_nodes]                          # [N, D] f32


def spmm_hub_tiled(dense_hub, rest_wb, rest_wb_t, x, ht: HubTiles):
    """Full SpMM on the hub layout: dense hub matmul + custom-vjp gather
    SpMM on the non-hub rest. Gradients flow to both value views and x."""
    from graphax.kernels.pallas_tiled import spmm_pallas

    out = spmm_hub(dense_hub, x, ht)
    res = spmm_pallas(rest_wb, rest_wb_t, x, ht.rest, ht.rest_t)
    return (out + res.astype(out.dtype)).astype(x.dtype)
