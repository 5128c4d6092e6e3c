"""Host-side graph partitioner for multi-chip diffusion.

Layout (SURVEY §2.8): contiguous node blocks of size ``Nb = ceil(N/P)`` per
shard; owner-computes edge assignment — every edge lives on the shard that
owns its aggregation target ``row``, so segment reductions (SpMM rows,
attention softmax over the row index) are shard-local. The only
communication a diffusion step needs is the *halo*: the set of non-local
``col`` nodes each shard gathers from. All tables are static-shape
(padded to the max over shards/pairs) so the exchange compiles to one
`all_to_all` per RHS evaluation inside the solver loop.

Every array is stacked over shards on axis 0 → shard it over the mesh's
'graph' axis and `shard_map` peels off the per-device slice.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from graphax.sparse.graph import Graph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class EdgePartition:
    """Static partition tables (host NumPy; shipped to device once).

    Shapes: P shards, Nb block size, Es padded edges/shard, H padded halo
    slots/shard, Hp padded halo slots per (src,dst) shard pair.
    """

    num_shards: int
    num_nodes: int          # global N (unpadded)
    block_size: int         # Nb; padded N = P · Nb
    local_row: np.ndarray   # [P, Es] int32 in [0, Nb)
    local_col: np.ndarray   # [P, Es] int32 in [0, Nb + H) — extended coords
    edge_weight: np.ndarray # [P, Es] float32
    edge_mask: np.ndarray   # [P, Es] bool
    send_idx: np.ndarray    # [P, P, Hp] int32 — device t sends x[send_idx[t, s]] to s
    halo_gather: np.ndarray # [P, H] int32 — halo slot h ← flat recv index
    halo_size: int          # H
    pair_size: int          # Hp
    node_mask: np.ndarray   # [P, Nb] bool — real (non-pad) nodes
    node_ids: np.ndarray = None  # [P, Nb] int64 original node id per slot
                                 # (-1 pad); None = contiguous id blocks

    @property
    def padded_nodes(self) -> int:
        return self.num_shards * self.block_size


def partition_graph(graph: Graph, num_shards: int,
                    pad_multiple: int = 8,
                    method: str = "contiguous",
                    num_slices: int = 1) -> EdgePartition:
    """Owner-computes edge partition. ``method="contiguous"`` assigns node
    blocks by raw id ranges; ``method="bfs"`` first runs the native balanced
    BFS region-growing partitioner (graphax.native.partition_bfs — the
    METIS-lite "graph growing" heuristic) and relabels nodes so each part is
    a contiguous block, typically cutting the halo several-fold on
    community-structured graphs (see SCALING.md).

    ``num_slices > 1`` (multi-host pods, with ``method="bfs"``): reorder the
    parts with `graphax.dist.multihost.dcn_block_order` so high-edge-cut
    part pairs are contiguous — on a DCN-outer mesh
    (`multihost.global_mesh`) consecutive shards share a slice, so the
    heavy halo traffic rides ICI and only the low-cut remainder crosses
    DCN (SURVEY §2.8 halo-exchange row)."""
    row = np.asarray(graph.row)
    col = np.asarray(graph.col)
    w = np.asarray(graph.edge_weight)
    mask = np.asarray(graph.edge_mask)
    row, col, w = row[mask], col[mask], w[mask]
    n, p = graph.num_nodes, num_shards
    nb = _round_up((n + p - 1) // p, pad_multiple)

    node_ids = None
    part_sizes = [max(min(n - s * nb, nb), 0) for s in range(p)]
    if method == "bfs":
        from graphax import native

        labels, _cut = native.partition_bfs(row, col, n, p, nb)
        if num_slices > 1 and p % num_slices == 0:
            from graphax.dist.multihost import dcn_block_order

            order = dcn_block_order(row, col, labels, p, num_slices)
            pos = np.empty(p, np.int64)
            pos[order] = np.arange(p)
            labels = pos[labels]
        node_ids = np.full((p, nb), -1, np.int64)
        newpos = np.empty(n, np.int64)
        part_sizes = []
        for s in range(p):
            ids = np.where(labels == s)[0]
            node_ids[s, :len(ids)] = ids
            newpos[ids] = s * nb + np.arange(len(ids))
            part_sizes.append(len(ids))
        row = newpos[row]
        col = newpos[col]
    elif method != "contiguous":
        raise ValueError(f"unknown partition method {method!r}")

    owner = row // nb
    # per-shard edge lists
    per_shard = [np.where(owner == s)[0] for s in range(p)]
    es = _round_up(max((len(ix) for ix in per_shard), default=1), pad_multiple)

    # halo requests: for each shard, remote cols grouped by owning shard
    requests = []   # requests[s][t] = sorted unique global node ids
    for s in range(p):
        cols_s = col[per_shard[s]]
        remote = cols_s[(cols_s < s * nb) | (cols_s >= (s + 1) * nb)]
        uniq = np.unique(remote)
        requests.append([uniq[(uniq // nb) == t] for t in range(p)])

    # floor of 1 slot (rounded up to the pad multiple): a halo-FREE
    # partition (single shard, or fully community-aligned) must still carry
    # non-empty static halo buffers — downstream gathers/all_to_alls are
    # shape-polymorphic over the halo size but not over zero
    hp = _round_up(max(max((len(r) for req in requests for r in req),
                           default=1), 1), pad_multiple)
    h = _round_up(max(max((sum(len(r) for r in req) for req in requests),
                          default=1), 1), pad_multiple)

    local_row = np.zeros((p, es), np.int32)
    local_col = np.zeros((p, es), np.int32)
    edge_weight = np.zeros((p, es), np.float32)
    edge_mask = np.zeros((p, es), bool)
    send_idx = np.zeros((p, p, hp), np.int32)
    halo_gather = np.zeros((p, h), np.int32)
    node_mask = np.zeros((p, nb), bool)

    for s in range(p):
        lo = s * nb
        node_mask[s, :part_sizes[s]] = True
        # halo coordinate map: global id -> extended local index
        halo_pos = {}
        slot = 0
        for t in range(p):
            req = requests[s][t]
            # device t's chunk for s: local indices of the nodes s requested
            send_idx[t, s, :len(req)] = (req - t * nb).astype(np.int32)
            for k, g in enumerate(req):
                halo_pos[int(g)] = nb + slot
                halo_gather[s, slot] = t * hp + k
                slot += 1
        ix = per_shard[s]
        e = len(ix)
        local_row[s, :e] = (row[ix] - lo).astype(np.int32)
        cols_s = col[ix]
        local = (cols_s >= lo) & (cols_s < lo + nb)
        lc = np.empty(e, np.int32)
        lc[local] = (cols_s[local] - lo).astype(np.int32)
        lc[~local] = np.asarray([halo_pos[int(g)] for g in cols_s[~local]],
                                np.int32)
        local_col[s, :e] = lc
        edge_weight[s, :e] = w[ix]
        edge_mask[s, :e] = True

    return EdgePartition(
        num_shards=p, num_nodes=n, block_size=nb, local_row=local_row,
        local_col=local_col, edge_weight=edge_weight, edge_mask=edge_mask,
        send_idx=send_idx, halo_gather=halo_gather, halo_size=h,
        pair_size=hp, node_mask=node_mask, node_ids=node_ids)


def shard_nodes(x: np.ndarray, part: EdgePartition) -> np.ndarray:
    """[N, D] node array → [P, Nb, D] stacked shards (zero-padded), applying
    the partition's node relabeling when present (bfs method)."""
    n, d = x.shape
    out = np.zeros((part.num_shards, part.block_size, d), x.dtype)
    for s in range(part.num_shards):
        if part.node_ids is not None:
            ids = part.node_ids[s]
            real = ids >= 0
            out[s, real] = x[ids[real]]
        else:
            lo = s * part.block_size
            hi = min(lo + part.block_size, n)
            if hi > lo:
                out[s, : hi - lo] = x[lo:hi]
    return out


def unshard_nodes(xs: np.ndarray, part: EdgePartition) -> np.ndarray:
    """[P, Nb, D] → [N, D] (inverse of :func:`shard_nodes`)."""
    p, nb, d = xs.shape
    if part.node_ids is None:
        return np.asarray(xs).reshape(p * nb, d)[: part.num_nodes]
    out = np.zeros((part.num_nodes, d), xs.dtype)
    for s in range(p):
        ids = part.node_ids[s]
        real = ids >= 0
        out[ids[real]] = np.asarray(xs)[s][real]
    return out


def pad_partition(part: EdgePartition, es: int = None, h: int = None,
                  hp: int = None) -> EdgePartition:
    """Grow a partition's static buffers to given caps: edge slots per
    shard (``es``), halo slots (``h``), per-pair halo slots (``hp``).
    ``halo_gather``'s flat receive indices are remapped for the new pair
    stride. Shrinking is not supported (caps are maxed with current sizes).

    Used by DistTrainer's epoch-boundary rewiring to keep every table
    shape identical across re-partitions, so the rebuilt tables re-enter
    the already-compiled jitted step (warm caches)."""
    es0 = part.local_row.shape[1]
    es = max(es0, es or 0)
    h0, hp0 = part.halo_size, part.pair_size
    h = max(h0, h or 0)
    hp = max(hp0, hp or 0)
    if (es, h, hp) == (es0, h0, hp0):
        return part
    p = part.num_shards

    def grow(a, width, fill=0):
        out = np.full(a.shape[:-1] + (width,), fill, a.dtype)
        out[..., : a.shape[-1]] = a
        return out

    hg = part.halo_gather
    hg_new = np.zeros((p, h), hg.dtype)
    hg_new[:, :h0] = (hg // hp0) * hp + (hg % hp0)
    return dataclasses.replace(
        part,
        local_row=grow(part.local_row, es),
        local_col=grow(part.local_col, es),
        edge_weight=grow(part.edge_weight, es),
        edge_mask=grow(part.edge_mask, es, fill=False),
        send_idx=grow(part.send_idx, hp),
        halo_gather=hg_new, halo_size=h, pair_size=hp)


def shard_row_tiles(part: EdgePartition, tile: int = 128,
                    block_edges: int = None, min_blocks: int = None):
    """Per-shard row-tiled block tables for the MXU scatter-free local
    compute inside shard_map (graphax.kernels.segment_mxu) — the multi-chip
    version of the single-chip tiled strategy. Returns a
    :class:`graphax.kernels.tiles.RowTiles` whose arrays carry a leading
    shard axis [P, ...]; static sizes (tiles / blocks / block_edges) are
    equalized across shards by padding with inert blocks."""
    p = part.num_shards
    rows = [part.local_row[s][part.edge_mask[s]] for s in range(p)]
    cols = [part.local_col[s][part.edge_mask[s]] for s in range(p)]
    slots = [np.where(part.edge_mask[s])[0] for s in range(p)]
    return shard_row_tiles_from(rows, cols, slots, part.block_size,
                                tile=tile, block_edges=block_edges,
                                min_blocks=min_blocks)


def shard_row_tiles_subset(part: EdgePartition, slot, mask, row, col,
                           tile: int = 128, block_edges: int = None,
                           min_blocks: int = None):
    """Per-shard row tiles for an EDGE SUBSET given as stacked split tables
    (the `halo_split_tables` format: ``slot [P, E']`` indexes the shard's
    [Es] value buffer, ``col`` already offset into its source buffer —
    local block for the halo-independent edges, halo buffer for the rest).
    Enables the MXU local compute on each half of the overlap split."""
    p = part.num_shards
    rows = [np.asarray(row[s])[np.asarray(mask[s])] for s in range(p)]
    cols = [np.asarray(col[s])[np.asarray(mask[s])] for s in range(p)]
    slots = [np.asarray(slot[s])[np.asarray(mask[s])] for s in range(p)]
    return shard_row_tiles_from(rows, cols, slots, part.block_size,
                                tile=tile, block_edges=block_edges,
                                min_blocks=min_blocks)


def shard_row_tiles_from(rows, cols, slots, nb: int, tile: int = 128,
                         block_edges: int = None, min_blocks: int = None):
    """Core of :func:`shard_row_tiles`: per-shard lists of (row, col,
    value-buffer slot) → stacked RowTiles. ``cols`` may index ANY source
    buffer (local block, extended local+halo, or the halo buffer alone) —
    `tiled_spmm` just gathers ``x[col]`` from whatever x it is given."""
    import jax.numpy as jnp

    from graphax.kernels.tiles import RowTiles, build_row_tiles, \
        choose_block_edges

    p = len(rows)
    per = []
    if block_edges is None:
        block_edges = max(
            choose_block_edges(np.sort(rows[s]), nb, tile=tile)
            for s in range(p))
    for s in range(p):
        lr = np.asarray(rows[s])
        lc = np.asarray(cols[s])
        sl = np.asarray(slots[s])
        order = np.argsort(lr, kind="stable")   # bfs relabel breaks order
        t = build_row_tiles(lr[order], lc[order], nb,
                            tile=tile, block_edges=block_edges)
        # edge_slot indexes the sorted view; remap into the shard buffer
        # (a shard may own ZERO subset edges — e.g. no halo-dependent
        # edges — and still carry padded blocks)
        es = np.asarray(t.edge_slot)
        remapped = sl[order][es] if sl.size else np.zeros(es.shape,
                                                          np.int64)
        per.append((np.where(np.asarray(t.slot_mask), remapped, 0),
                    np.asarray(t.slot_mask), np.asarray(t.col),
                    np.asarray(t.local_row), np.asarray(t.tile_idx),
                    t.num_tiles))
    num_tiles = per[0][5]
    b_max = max(x[4].shape[0] for x in per)
    if min_blocks is not None:
        b_max = max(b_max, min_blocks)   # shape pinning across rebuilds
    eb = block_edges

    def pad(es, sm, co, lr_, ti):
        b = ti.shape[0]
        if b < b_max:
            fill_tile = ti[-1] if b else 0
            es = np.concatenate([es, np.zeros((b_max - b, eb), es.dtype)])
            sm = np.concatenate([sm, np.zeros((b_max - b, eb), bool)])
            co = np.concatenate([co, np.zeros((b_max - b, eb), co.dtype)])
            lr_ = np.concatenate([lr_, np.full((b_max - b, eb), tile,
                                               lr_.dtype)])
            ti = np.concatenate([ti, np.full((b_max - b,), fill_tile,
                                             ti.dtype)])
        return es, sm, co, lr_, ti

    stacked = [pad(*x[:5]) for x in per]
    return RowTiles(
        edge_slot=jnp.asarray(np.stack([x[0] for x in stacked])
                              .astype(np.int32)),
        slot_mask=jnp.asarray(np.stack([x[1] for x in stacked])),
        col=jnp.asarray(np.stack([x[2] for x in stacked]).astype(np.int32)),
        local_row=jnp.asarray(np.stack([x[3] for x in stacked])
                              .astype(np.int32)),
        tile_idx=jnp.asarray(np.stack([x[4] for x in stacked])
                             .astype(np.int32)),
        num_tiles=num_tiles, tile=tile, block_edges=eb, num_nodes=nb)
