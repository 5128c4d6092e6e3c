"""shard_map'd diffusion compute: halo exchange + local SpMM / attention.

Two interchangeable communication strategies for gathering the remote
``col`` features every RHS evaluation needs:

- ``sharded_spmm_allgather`` — `all_gather` the full node state (bandwidth
  N·D per NFE). Simple, right for small N or very dense cuts.
- ``sharded_spmm_halo`` — one `all_to_all` moving only boundary nodes
  (bandwidth = halo·D per NFE). This is the context-parallel analog from
  SURVEY §5.7: the "KV exchange" is boundary node features per step.

Everything runs inside `shard_map` over the mesh's 'graph' axis with
static-shape tables from :func:`graphax.dist.partition.partition_graph`.
Gradients flow through the collectives (JAX transposes all_to_all/all_gather
automatically), so the same code serves training. On a 1-device mesh the
collectives degrade to copies.

Stacked-shard convention: node state is ``[P, Nb, D]``; shard_map peels the
leading axis so each device computes on its ``[Nb, D]`` block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from graphax.dist.partition import EdgePartition


def halo_exchange(x_local, send_idx, halo_gather, num_shards: int,
                  pair_size: int, axis_name: str):
    """One all_to_all moving boundary rows. ``send_idx [P, Hp]``: rows of MY
    block each peer requested (in their request order); ``halo_gather [H]``:
    flat (peer·Hp + slot) source for each of my halo slots. Returns [H, D]."""
    d = x_local.shape[-1]
    send_buf = x_local[send_idx.reshape(-1)].reshape(num_shards, pair_size, d)
    # chunk s of my buffer → device s; my output chunk t ← device t's chunk me
    recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                              concat_axis=0, tiled=False)
    return recv.reshape(num_shards * pair_size, d)[halo_gather]


def _local_spmm(local_row, local_col, weight, x_ext, block_size: int):
    """Row-owned edges ⇒ the segment-sum over [0, Nb) is shard-local."""
    gathered = x_ext[local_col] * weight[:, None]
    return jax.ops.segment_sum(gathered, local_row, num_segments=block_size)


def _device_tables(part: EdgePartition):
    """Per-shard tables as jnp arrays, stacked on the shard axis."""
    return (jnp.asarray(part.local_row), jnp.asarray(part.local_col),
            jnp.asarray(part.edge_weight * part.edge_mask),
            jnp.asarray(part.send_idx), jnp.asarray(part.halo_gather))


def sharded_spmm_halo(mesh: Mesh, part: EdgePartition,
                      axis_name: str = "graph", use_tiles: bool = False):
    """Returns ``f(xs [P, Nb, D], weights=None) -> [P, Nb, D]`` computing
    ``A @ x`` with the halo all_to_all. ``weights [P, Es]`` optionally
    overrides the partition's edge weights (e.g. pinned attention).

    ``use_tiles``: the local segment reduction runs on the per-shard
    row-tiled MXU path (graphax.kernels.segment_mxu — no E-sized scatters)
    instead of ``jax.ops.segment_sum`` — the production multi-chip compute;
    numerically interchangeable, pinned by tests."""
    tables = _device_tables(part)
    spec = P(axis_name)
    specs5 = (spec, spec, spec, spec, spec)
    tiles = None
    if use_tiles:
        from graphax.dist.partition import shard_row_tiles

        tiles = shard_row_tiles(part)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, specs5, spec), out_specs=spec)
    def run(xs, tbl, tiles_arrs):
        local_row, local_col, weight, send_idx, halo_gather = \
            tuple(t[0] for t in tbl)
        halo = halo_exchange(xs[0], send_idx, halo_gather, part.num_shards,
                             part.pair_size, axis_name)
        x_ext = jnp.concatenate([xs[0], halo], axis=0)
        if tiles is not None:
            import dataclasses

            from graphax.kernels.segment_mxu import tiled_spmm

            t_local = dataclasses.replace(
                tiles, **{k: a[0] for k, a in zip(
                    ("edge_slot", "slot_mask", "col", "local_row",
                     "tile_idx"), tiles_arrs)})
            out = tiled_spmm(weight, x_ext, t_local)[:part.block_size]
        else:
            out = _local_spmm(local_row, local_col, weight, x_ext,
                              part.block_size)
        return out[None]

    tiles_arrs = () if tiles is None else (
        tiles.edge_slot, tiles.slot_mask, tiles.col, tiles.local_row,
        tiles.tile_idx)

    def f(xs, weights=None):
        tbl = tables if weights is None else \
            (tables[0], tables[1], weights, tables[3], tables[4])
        return run(xs, tbl, tiles_arrs)

    return f


def shard_window_tables(part: EdgePartition, window: int = 512,
                        tile: int = 128):
    """Host: per-shard windowed (block-dense) layout for
    :func:`sharded_spmm_windowed` — the multi-chip version of the
    single-chip windowed strategy (graphax.kernels.windows).

    Per shard, each ``tile``-row group of the local block picks the aligned
    ``window``-wide column range (over the EXTENDED local space
    ``[0, Nb+H)`` — owned rows then halo slots) covering the most edges.
    With the bfs (community) partitioner, communities are contiguous inside
    each shard, so most edges land in-window; cut edges gather from halo
    windows and mostly fall to the residual. Returns a dict of stacked
    ``[P, ...]`` arrays (all static)."""
    import numpy as np

    p, nb = part.num_shards, part.block_size
    ext = nb + part.halo_size
    t = (nb + tile - 1) // tile
    nbp = t * tile
    nw = (ext + window - 1) // window
    es = part.local_row.shape[1]

    flat_idx = np.zeros((p, es), np.int64)
    in_win = np.zeros((p, es), bool)
    tile_win = np.zeros((p, t), np.int32)
    res = []
    for s in range(p):
        m = part.edge_mask[s]
        lr = part.local_row[s].astype(np.int64)
        lc = part.local_col[s].astype(np.int64)
        te, we = lr // tile, lc // window
        counts = np.bincount(te[m] * nw + we[m],
                             minlength=t * nw).reshape(t, nw)
        best = counts.argmax(axis=1)
        tile_win[s] = best.astype(np.int32)
        iw = m & (we == best[te])
        in_win[s] = iw
        flat_idx[s] = np.where(iw, lr * window + (lc - best[te] * window), 0)
        res.append(np.where(m & ~iw)[0])
    er = max(max(len(r) for r in res), 1)
    res_slot = np.zeros((p, er), np.int32)
    res_mask = np.zeros((p, er), bool)
    res_row = np.zeros((p, er), np.int32)
    res_col = np.zeros((p, er), np.int32)
    for s in range(p):
        k = len(res[s])
        res_slot[s, :k] = res[s]
        res_mask[s, :k] = True
        res_row[s, :k] = part.local_row[s][res[s]]
        res_col[s, :k] = part.local_col[s][res[s]]
    return dict(flat_idx=flat_idx, in_win=in_win, tile_win=tile_win,
                res_slot=res_slot, res_mask=res_mask, res_row=res_row,
                res_col=res_col, window=window, tile=tile, num_tiles=t,
                padded_rows=nbp, num_windows=nw, ext=ext)


def windowed_overlap_pack(part: EdgePartition, wtab):
    """Host: static per-shard tables for the overlap-split windowed per-NFE
    compute (halo-independent tiles/residual vs halo-dependent), stacked
    ``[P, ...]``. Shared by :func:`sharded_spmm_windowed` and the
    production model's windowed local compute (graphax.dist.model)."""
    import numpy as np

    p, nb = part.num_shards, part.block_size
    window = wtab["window"]
    tw_np = wtab["tile_win"]                       # [P, T]
    is_loc_tile = (tw_np + 1) * window <= nb       # window ⊂ owned block
    lt_max = max(int(m.sum()) for m in is_loc_tile)
    ht_max = max(int((~m).sum()) for m in is_loc_tile)
    lt_idx = np.zeros((p, max(lt_max, 1)), np.int32)
    lt_mask = np.zeros((p, max(lt_max, 1)), bool)
    ht_idx = np.zeros((p, max(ht_max, 1)), np.int32)
    ht_mask = np.zeros((p, max(ht_max, 1)), bool)
    for s in range(p):
        li = np.where(is_loc_tile[s])[0]
        hi = np.where(~is_loc_tile[s])[0]
        lt_idx[s, :len(li)] = li
        lt_mask[s, :len(li)] = True
        ht_idx[s, :len(hi)] = hi
        ht_mask[s, :len(hi)] = True
    rc_np, rm_np = wtab["res_col"], wtab["res_mask"]
    res_is_loc = rm_np & (rc_np < nb)
    res_is_hal = rm_np & (rc_np >= nb)
    rl_max = max(max(int(m.sum()) for m in res_is_loc), 1)
    rh_max = max(max(int(m.sum()) for m in res_is_hal), 1)

    def pack_res(which, cap, off):
        sl = np.zeros((p, cap), np.int32)
        mk = np.zeros((p, cap), bool)
        rr_ = np.zeros((p, cap), np.int32)
        cc = np.zeros((p, cap), np.int32)
        for s in range(p):
            ix = np.where(which[s])[0]
            sl[s, :len(ix)] = ix
            mk[s, :len(ix)] = True
            rr_[s, :len(ix)] = wtab["res_row"][s][ix]
            cc[s, :len(ix)] = rc_np[s][ix] - off
        return sl, mk, rr_, cc

    rl_slot, rl_mask, rl_row, rl_col = pack_res(res_is_loc, rl_max, 0)
    rh_slot, rh_mask, rh_row, rh_col = pack_res(res_is_hal, rh_max, nb)
    return dict(
        lt_idx=lt_idx, lt_mask=lt_mask, ht_idx=ht_idx, ht_mask=ht_mask,
        rl_slot=rl_slot, rl_mask=rl_mask, rl_row=rl_row, rl_col=rl_col,
        rh_slot=rh_slot, rh_mask=rh_mask, rh_row=rh_row, rh_col=rh_col,
        tile_win=tw_np, flat_idx=wtab["flat_idx"], in_win=wtab["in_win"],
        res_slot=wtab["res_slot"], res_mask=wtab["res_mask"])


def windowed_prepare_local(wv, t_, consts):
    """Per-shard (INSIDE shard_map): densify in-window edge values into the
    ``[T, tile, W]`` MXU operator blocks + residual values — once per
    forward / pinned value set, not per NFE. Differentiable (the scatter's
    transpose is a gather)."""
    t, tile, window = consts["t"], consts["tile"], consts["window"]
    nbp = t * tile
    dense = jnp.zeros((nbp * window,), wv.dtype) \
        .at[t_["flat_idx"]].add(jnp.where(t_["in_win"], wv, 0)) \
        .reshape(t, tile, window)
    res_vals = jnp.where(t_["res_mask"], wv[t_["res_slot"]], 0)
    return dense, res_vals


def windowed_run_local(x, dense, rv, t_, consts, num_shards, pair_size,
                       axis_name):
    """Per-shard (INSIDE shard_map) windowed per-NFE ``A @ x`` with the
    halo all_to_all overlapped by the halo-independent MXU work (local
    windows + local-col residual edges)."""
    nb, nw, nwl, ext = (consts["nb"], consts["nw"], consts["nwl"],
                        consts["ext"])
    t, tile, window = consts["t"], consts["tile"], consts["window"]
    nbp = t * tile
    d = x.shape[-1]
    # 1) issue the exchange
    send_buf = x[t_["send_idx"].reshape(-1)] \
        .reshape(num_shards, pair_size, d)
    recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                              concat_axis=0, tiled=False)
    # 2) halo-independent MXU work (overlaps the collective):
    #    local-window tiles against the owned-block slab
    slab_loc = jnp.pad(x, ((0, nwl * window - nb), (0, 0))) \
        .reshape(nwl, window, d)
    tw_l = jnp.clip(t_["tile_win"][t_["lt_idx"]], 0, nwl - 1)
    dn_l = dense[t_["lt_idx"]] * t_["lt_mask"][:, None, None]
    out_t = jnp.zeros((t, tile, d), jnp.float32)
    out_t = out_t.at[t_["lt_idx"]].add(
        jnp.einsum("trw,twd->trd", dn_l,
                   jnp.take(slab_loc, tw_l, axis=0),
                   preferred_element_type=jnp.float32))
    #    + local-col residual edges
    w_rl = jnp.where(t_["rl_mask"], rv[t_["rl_slot"]], 0.0)
    outr = jax.ops.segment_sum(
        x[t_["rl_col"]] * w_rl[:, None].astype(x.dtype), t_["rl_row"],
        num_segments=nb)
    # 3) halo-dependent work
    halo = recv.reshape(num_shards * pair_size, d)[t_["halo_gather"]]
    x_ext = jnp.concatenate([x, halo], axis=0)
    slab_ext = jnp.pad(x_ext, ((0, nw * window - ext), (0, 0))) \
        .reshape(nw, window, d)
    tw_h = t_["tile_win"][t_["ht_idx"]]
    dn_h = dense[t_["ht_idx"]] * t_["ht_mask"][:, None, None]
    out_t = out_t.at[t_["ht_idx"]].add(
        jnp.einsum("trw,twd->trd", dn_h,
                   jnp.take(slab_ext, tw_h, axis=0),
                   preferred_element_type=jnp.float32))
    w_rh = jnp.where(t_["rh_mask"], rv[t_["rh_slot"]], 0.0)
    outr = outr + jax.ops.segment_sum(
        halo[t_["rh_col"]] * w_rh[:, None].astype(x.dtype), t_["rh_row"],
        num_segments=nb)
    out = out_t.reshape(nbp, d)[:nb] + outr
    return out.astype(x.dtype)


def sharded_spmm_windowed(mesh: Mesh, part: EdgePartition,
                          window: int = 512, tile: int = 128,
                          axis_name: str = "graph", overlap: bool = True):
    """Windowed (block-dense) sharded ``A @ x``: returns ``(prepare, f)``.

    ``prepare(weights=None) -> state`` densifies each shard's in-window
    edges into ``[T, tile, W]`` MXU operator blocks — ONCE per forward
    (per pinned edge-value set), not per solver evaluation.
    ``f(xs [P, Nb, D], state) -> [P, Nb, D]`` runs per NFE: halo
    all_to_all, one batched block matmul against the extended-state window
    slabs, plus a segment-sum over the (typically small) residual edge set.
    Differentiable end to end (gradients flow through prepare's scatter and
    the collectives).

    ``overlap=True`` (default) splits the per-NFE work into a
    halo-independent part (tiles whose window lies inside the owned block +
    residual edges with local cols) scheduled WHILE the all_to_all is in
    flight, and a halo part afterwards — SURVEY §2.8's "all_to_all …
    overlapped with local-block SpMM". With the BFS community partitioner
    most tiles pick local windows, so most MXU work hides the exchange.
    Numerically identical to overlap=False (same edges, reassociated sums)."""
    import numpy as np

    wtab = shard_window_tables(part, window=window, tile=tile)
    t, nbp = wtab["num_tiles"], wtab["padded_rows"]
    nw, ext, nb = wtab["num_windows"], wtab["ext"], part.block_size
    gspec = P(axis_name)
    p = part.num_shards

    flat_idx = jnp.asarray(wtab["flat_idx"])
    in_win = jnp.asarray(wtab["in_win"])
    tile_win = jnp.asarray(wtab["tile_win"])
    res_slot = jnp.asarray(wtab["res_slot"])
    res_mask = jnp.asarray(wtab["res_mask"])
    res_row = jnp.asarray(wtab["res_row"])
    res_col = jnp.asarray(wtab["res_col"])
    base_w = jnp.asarray(part.edge_weight * part.edge_mask)
    send_idx = jnp.asarray(part.send_idx)
    halo_gather = jnp.asarray(part.halo_gather)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(gspec, (gspec, gspec, gspec, gspec)),
        out_specs=(gspec, gspec))
    def prepare_sm(w, tbl):
        fi, iw, rs, rm = tuple(a[0] for a in tbl)
        dense, res_vals = windowed_prepare_local(
            w[0], dict(flat_idx=fi, in_win=iw, res_slot=rs, res_mask=rm),
            dict(t=t, tile=tile, window=window))
        return dense[None], res_vals[None]

    def prepare(weights=None):
        w = base_w if weights is None else weights
        return prepare_sm(w, (flat_idx, in_win, res_slot, res_mask))

    # ---- host: split tiles & residual edges into halo-independent vs
    # halo-dependent groups (static, per shard, padded to max) -------------
    nwl = (nb + window - 1) // window              # local slab windows
    pack = windowed_overlap_pack(part, wtab)
    ov_tabs = {k: jnp.asarray(v) for k, v in dict(
        **{k: v for k, v in pack.items()
           if k not in ("flat_idx", "in_win", "res_slot", "res_mask")},
        send_idx=part.send_idx, halo_gather=part.halo_gather).items()}
    ov_keys = tuple(sorted(ov_tabs))
    consts = dict(nb=nb, nw=nw, nwl=nwl, ext=ext, t=t, tile=tile,
                  window=window)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(gspec, gspec, gspec, (gspec,) * 5),
        out_specs=gspec)
    def run_serial(xs, dense, res_vals, tbl):
        tw, rr, rc, sidx, hg = tuple(a[0] for a in tbl)
        x = xs[0]
        halo = halo_exchange(x, sidx, hg, part.num_shards, part.pair_size,
                             axis_name)
        x_ext = jnp.concatenate([x, halo], axis=0)          # [ext, D]
        d = x_ext.shape[-1]
        slab = jnp.pad(x_ext, ((0, nw * window - ext), (0, 0))) \
            .reshape(nw, window, d)
        per_tile = jnp.take(slab, tw, axis=0)               # [T, W, D]
        outw = jnp.einsum("trw,twd->trd", dense[0], per_tile,
                          preferred_element_type=jnp.float32) \
            .reshape(nbp, d)[:nb]
        gathered = x_ext[rc] * res_vals[0][:, None]
        outr = jax.ops.segment_sum(gathered, rr, num_segments=nb)
        return (outw + outr).astype(x.dtype)[None]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(gspec, gspec, gspec, {k: gspec for k in ov_keys}),
        out_specs=gspec)
    def run_overlap(xs, dense, res_vals, tbl):
        t_ = {k: v[0] for k, v in tbl.items()}
        out = windowed_run_local(xs[0], dense[0], res_vals[0], t_, consts,
                                 part.num_shards, part.pair_size, axis_name)
        return out[None]

    def f(xs, state):
        dense, res_vals = state
        if overlap:
            return run_overlap(xs, dense, res_vals, ov_tabs)
        return run_serial(xs, dense, res_vals,
                          (tile_win, res_row, res_col, send_idx,
                           halo_gather))

    return prepare, f


def halo_split_tables(part: EdgePartition, pad_multiple: int = 8):
    """Host: split each shard's edge list into halo-INDEPENDENT edges
    (col < Nb — gather from the local block) and halo-DEPENDENT edges
    (col ≥ Nb — gather from the exchange result). Static stacked tables.

    This is the enabler for communication/compute overlap (SURVEY §2.8
    "all_to_all … overlapped with local-block SpMM"): the local partial sum
    has NO data dependency on the all_to_all, so XLA's latency-hiding
    scheduler runs it while the collective is in flight."""
    import numpy as np

    p, nb = part.num_shards, part.block_size
    loc, hal = [], []
    for s in range(p):
        m = part.edge_mask[s]
        is_halo = part.local_col[s] >= nb
        loc.append(np.where(m & ~is_halo)[0])
        hal.append(np.where(m & is_halo)[0])
    el = _pad_len(max(len(x) for x in loc), pad_multiple)
    eh = _pad_len(max(max(len(x) for x in hal), 1), pad_multiple)

    def pack(idx_lists, cap, col_offset):
        slot = np.zeros((p, cap), np.int32)
        mask = np.zeros((p, cap), bool)
        row = np.zeros((p, cap), np.int32)
        col = np.zeros((p, cap), np.int32)
        for s in range(p):
            ix = idx_lists[s]
            k = len(ix)
            slot[s, :k] = ix
            mask[s, :k] = True
            row[s, :k] = part.local_row[s][ix]
            col[s, :k] = part.local_col[s][ix] - col_offset
        return slot, mask, row, col

    l_slot, l_mask, l_row, l_col = pack(loc, el, 0)
    h_slot, h_mask, h_row, h_col = pack(hal, eh, nb)
    return dict(loc_slot=l_slot, loc_mask=l_mask, loc_row=l_row,
                loc_col=l_col, halo_slot=h_slot, halo_mask=h_mask,
                halo_row=h_row, halo_col=h_col)


def _pad_len(n: int, m: int) -> int:
    return ((max(n, 1) + m - 1) // m) * m


def sharded_spmm_halo_overlap(mesh: Mesh, part: EdgePartition,
                              axis_name: str = "graph"):
    """``A @ x`` with the halo exchange OVERLAPPED with the local-block
    partial SpMM: issue the all_to_all, reduce the halo-independent edges
    against the local state (no dependency on the collective), then add the
    halo-edge partial once the exchange lands. Numerically identical to
    :func:`sharded_spmm_halo` (same edges, two segment-sums instead of one;
    pinned by tests/test_dist.py)."""
    split = halo_split_tables(part)
    tabs = {k: jnp.asarray(v) for k, v in split.items()}
    tabs["weight"] = jnp.asarray(part.edge_weight * part.edge_mask)
    tabs["send_idx"] = jnp.asarray(part.send_idx)
    tabs["halo_gather"] = jnp.asarray(part.halo_gather)
    keys = tuple(sorted(tabs))
    spec = P(axis_name)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, {k: spec for k in keys}),
                       out_specs=spec)
    def run(xs, tbl):
        t = {k: v[0] for k, v in tbl.items()}
        x = xs[0]
        d = x.shape[-1]
        # 1) issue the exchange
        send_buf = x[t["send_idx"].reshape(-1)] \
            .reshape(part.num_shards, part.pair_size, d)
        recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)
        # 2) local partial — independent of `recv`, overlaps the collective
        w_loc = jnp.where(t["loc_mask"], t["weight"][t["loc_slot"]], 0.0)
        out = jax.ops.segment_sum(x[t["loc_col"]] * w_loc[:, None],
                                  t["loc_row"],
                                  num_segments=part.block_size)
        # 3) halo partial — consumes the exchange
        halo = recv.reshape(part.num_shards * part.pair_size,
                            d)[t["halo_gather"]]
        w_hal = jnp.where(t["halo_mask"], t["weight"][t["halo_slot"]], 0.0)
        out = out + jax.ops.segment_sum(
            halo[t["halo_col"]] * w_hal[:, None], t["halo_row"],
            num_segments=part.block_size)
        return out[None]

    def f(xs, weights=None):
        tbl = tabs if weights is None else {**tabs, "weight": weights}
        return run(xs, tbl)

    return f


def _global_cols(part: EdgePartition):
    """Extended local col coords → global (padded) node ids, for the
    all_gather strategy."""
    import numpy as np

    p, nb, hp = part.num_shards, part.block_size, part.pair_size
    inv = np.zeros((p, p * hp), np.int64)
    for s in range(p):
        for t in range(p):
            inv[s, t * hp:(t + 1) * hp] = t * nb + part.send_idx[t, s]
    col_global = np.zeros_like(part.local_col, dtype=np.int64)
    for s in range(p):
        lc = part.local_col[s]
        is_halo = lc >= nb
        col_global[s, ~is_halo] = s * nb + lc[~is_halo]
        col_global[s, is_halo] = inv[s, part.halo_gather[s][lc[is_halo] - nb]]
    return col_global


def sharded_spmm_allgather(mesh: Mesh, part: EdgePartition,
                           axis_name: str = "graph"):
    """all_gather baseline: gather [N_pad, D] then index global cols."""
    tables = (jnp.asarray(part.local_row), jnp.asarray(_global_cols(part)),
              jnp.asarray(part.edge_weight * part.edge_mask))
    spec = P(axis_name)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, (spec, spec, spec)), out_specs=spec)
    def run(xs, tbl):
        local_row, colg, weight = tuple(t[0] for t in tbl)
        x_full = jax.lax.all_gather(xs[0], axis_name, axis=0, tiled=True)
        gathered = x_full[colg] * weight[:, None]
        out = jax.ops.segment_sum(gathered, local_row,
                                  num_segments=part.block_size)
        return out[None]

    return lambda xs: run(xs, tables)


def make_sharded_diffusion_step(mesh: Mesh, part: EdgePartition,
                                alpha_sigmoid: bool = True,
                                axis_name: str = "graph"):
    """Sharded GRAND-l RHS on stacked state: ``f = σ(α)(Ax − x) [+ β·x0]``.
    Drop straight into graphax.ode solvers (state pytree = [P, Nb, D])."""
    spmm = sharded_spmm_halo(mesh, part, axis_name)

    def rhs(params, xs, x0s=None):
        ax = spmm(xs)
        alpha = params["alpha_train"]
        if alpha_sigmoid:
            alpha = jax.nn.sigmoid(alpha)
        f = alpha * (ax - xs)
        if x0s is not None:
            f = f + params["beta_train"] * x0s
        return f

    return rhs


# ----------------------------------------------------------------------
# Hub-slab sharded SpMM (power-law graphs)
# ----------------------------------------------------------------------

def _relabeled_edges(part: EdgePartition):
    """Per-shard edges of ``part`` in RELABELED global coordinates (node
    g lives at slot g%Nb of shard g//Nb — partition_graph's post-relabel id
    space). Halo cols map back through send_idx/halo_gather."""
    import numpy as np

    p, nb, hp = part.num_shards, part.block_size, part.pair_size
    rows, cols, ws = [], [], []
    for s in range(p):
        m = part.edge_mask[s]
        lr = part.local_row[s][m].astype(np.int64)
        lc = part.local_col[s][m].astype(np.int64)
        w = part.edge_weight[s][m]
        # extended col -> relabeled global id
        halo_flat = part.halo_gather[s]              # [H] = t*Hp + k
        t_of = halo_flat // hp
        k_of = halo_flat % hp
        halo_global = t_of * nb + part.send_idx[t_of, s, k_of]
        is_halo = lc >= nb
        gcol = np.where(is_halo, halo_global[np.clip(lc - nb, 0, None)],
                        s * nb + lc)
        rows.append(s * nb + lr)
        cols.append(gcol)
        ws.append(w)
    return (np.concatenate(rows), np.concatenate(cols), np.concatenate(ws))


def sharded_spmm_hub(mesh: Mesh, part: EdgePartition,
                     candidates=(128, 256, 512, 1024), tile: int = 8,
                     axis_name: str = "graph", force: bool = False):
    """Hub-slab sharded ``A @ x``: the top-in-degree columns' rows are
    assembled once per NFE into a replicated ``[H, D]`` slab (one tiny
    ``psum`` — H·D bytes instead of duplicating hub rows into every
    shard's halo), hub edges ride a dense per-shard ``[T, tile, H]`` MXU
    matmul (graphax.kernels.hubs single-chip layout, sharded), and the
    hub-free remainder goes through a REBUILT halo exchange whose volume
    shrinks by every column only hubs referenced. Falls back to
    :func:`sharded_spmm_halo` (returns it unchanged) when the degree
    distribution doesn't pay.

    Static edge weights (the GRAND-l rw/gcn case); per-forward attention
    values keep the halo/windowed strategies.
    """
    import numpy as np

    from graphax.dist.partition import partition_graph
    from graphax.sparse.graph import Graph

    p, nb = part.num_shards, part.block_size
    row_rel, col_rel, w_rel = _relabeled_edges(part)
    n_rel = p * nb

    # global hub selection in relabeled space (permutation-invariant)
    indeg = np.bincount(col_rel, minlength=n_rel)
    order = np.argsort(indeg)[::-1]
    cum = np.cumsum(indeg[order])
    t_loc = (nb + tile - 1) // tile
    from graphax.kernels.hubs import GATHER_NS_PER_EDGE, HBM_GBPS

    # per-chip gain: padded edge slots the straggler shard sheds (the
    # sharded tables pad every shard to the max shard's edge count) minus
    # the dense hub block streaming cost
    owner_of = row_rel // nb
    full_max = int(np.bincount(owner_of, minlength=p).max())
    best_h, best_gain = None, 0.0
    for h_c in candidates:
        if h_c > n_rel:
            break
        hub_cols = order[:h_c]
        is_h = np.zeros(n_rel, bool)
        is_h[hub_cols] = True
        keep_rest = ~is_h[col_rel]
        rest_max = int(np.bincount(owner_of[keep_rest], minlength=p).max())
        gain = ((full_max - rest_max) * GATHER_NS_PER_EDGE * 1e-9
                - t_loc * tile * h_c * 2 / (HBM_GBPS * 1e9))
        if gain > best_gain:
            best_h, best_gain = h_c, gain
    if best_h is None:
        if not force:
            return sharded_spmm_halo(mesh, part, axis_name=axis_name)
        best_h = [h_c for h_c in candidates if h_c <= n_rel][-1]

    h = best_h
    hub_ids = np.sort(order[:h])
    rank = np.full(n_rel, -1, np.int64)
    rank[hub_ids] = np.arange(h)
    is_hub = rank[col_rel] >= 0

    # rebuilt halo partition over the hub-free remainder — same block
    # layout (contiguous over the relabeled space), smaller halo
    g_rest = Graph.from_edges(row_rel[~is_hub], col_rel[~is_hub], n_rel,
                              edge_weight=w_rel[~is_hub])
    part_rest = partition_graph(g_rest, p)
    assert part_rest.block_size == nb, \
        (part_rest.block_size, nb)
    rest_f = sharded_spmm_halo(mesh, part_rest, axis_name=axis_name)

    # per-shard dense hub operator blocks (static weights -> densify here)
    nbp = t_loc * tile
    dense_hub = np.zeros((p, nbp, h), np.float32)
    sh = row_rel[is_hub] // nb
    lrh = row_rel[is_hub] % nb
    rkh = rank[col_rel[is_hub]]
    np.add.at(dense_hub, (sh, lrh, rkh), w_rel[is_hub])
    dense_hub_j = jnp.asarray(dense_hub)

    # slab assembly: which of my local slots are hubs (owner = id // Nb)
    own_counts = np.bincount(hub_ids // nb, minlength=p)
    ho = max(int(own_counts.max()), 1)
    own_slot = np.zeros((p, ho), np.int32)
    own_rank = np.zeros((p, ho), np.int32)
    own_mask = np.zeros((p, ho), bool)
    for s in range(p):
        mine = hub_ids[(hub_ids // nb) == s]
        own_slot[s, :len(mine)] = mine % nb
        own_rank[s, :len(mine)] = rank[mine]
        own_mask[s, :len(mine)] = True
    own_slot_j = jnp.asarray(own_slot)
    own_rank_j = jnp.asarray(own_rank)
    own_mask_j = jnp.asarray(own_mask)

    gspec = P(axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(gspec, gspec, (gspec, gspec, gspec)),
        out_specs=gspec)
    def hub_part(xs, dense, own):
        x_local = xs[0]
        oslot, orank, omask = tuple(a[0] for a in own)
        d = x_local.shape[-1]
        contrib = jnp.where(omask[:, None], x_local[oslot], 0)
        slab = jnp.zeros((h, d), x_local.dtype).at[orank].add(contrib)
        slab = jax.lax.psum(slab, axis_name)         # [H, D] replicated
        out = jnp.matmul(dense[0].astype(x_local.dtype), slab,
                         preferred_element_type=jnp.float32)  # [nbp, D]
        return out[None, :nb].astype(x_local.dtype)

    def f(xs):
        hub_out = hub_part(xs, dense_hub_j,
                           (own_slot_j, own_rank_j, own_mask_j))
        return (rest_f(xs) + hub_out).astype(xs.dtype)

    f.hub_size = h
    f.halo_before = part.halo_size
    f.halo_after = part_rest.halo_size
    return f


def shard_window_blocks(part: EdgePartition, window: int = 512,
                        tile: int = 128, block_edges: int = 2048):
    """Host: per-shard BLOCKED windowed layout for the Pallas sharded
    windowed local compute (r4.2, graphax.dist.model ``local_tiles=
    "windowed"``).

    Window selection is `shard_window_tables`'s: each ``tile``-row group of
    the owned block picks the aligned ``window``-wide column range over the
    EXTENDED local space ``[0, Nb+H)`` (owned rows then halo slots) covering
    the most edges. This builder then produces what the single-chip Pallas
    kernels consume:

    - in-window edges chunked into ``[Bw, Eb]`` blocks (consecutive blocks
      per row tile) with window-local columns — `pallas_windows`
      ``densify_windows`` + ``win_matmul``;
    - a per-tile locality flag (window entirely within the owned block) so
      the per-NFE matmul splits into a halo-independent pass that overlaps
      the all_to_all and a halo pass;
    - residual (out-of-window) edges split owned-col / halo-col as TWO
      RowTiles sets (the `_spmm_cv` overlap pair) plus ONE transpose
      layout over the extended col space covering exactly the residual
      subset — the custom-VJP backward's scatter-free dx_ext.

    Returns (tables dict of stacked ``[P, ...]`` arrays, consts dict).
    """
    import numpy as np

    from graphax.dist.partition import shard_row_tiles_from

    p, nb = part.num_shards, part.block_size
    ext = nb + part.halo_size
    t = (nb + tile - 1) // tile
    nw = (ext + window - 1) // window
    nwl = (nb + window - 1) // window

    per_blocks = []
    tile_win = np.zeros((p, t), np.int32)
    loc_tile = np.zeros((p, t), bool)
    r_loc, c_loc, s_loc = [], [], []          # residual, owned cols
    r_hal, c_hal, s_hal = [], [], []          # residual, halo cols (buffer-rel)
    rows_t, cols_t, slots_t = [], [], []      # transpose over ext
    max_blocks = 1
    for s in range(p):
        m = np.asarray(part.edge_mask[s])
        lr = np.asarray(part.local_row[s]).astype(np.int64)
        lc = np.asarray(part.local_col[s]).astype(np.int64)
        te, we = lr // tile, lc // window
        counts = np.bincount(te[m] * nw + we[m],
                             minlength=t * nw).reshape(t, nw)
        best = counts.argmax(axis=1)
        tile_win[s] = best.astype(np.int32)
        loc_tile[s] = (best + 1) * window <= nb
        iw = m & (we == best[te])

        idx = np.where(iw)[0]
        order = np.lexsort((lc[idx], lr[idx]))
        idx = idx[order]
        # chunk per row tile into blocks of block_edges
        blocks = []        # (tile_idx, slots)
        tiles_of = te[idx]
        start = 0
        for ti in range(t):
            k = int(np.searchsorted(tiles_of, ti + 1, side="left"))
            for b0 in range(start, k, block_edges):
                blocks.append((ti, idx[b0:min(b0 + block_edges, k)]))
            start = k
        per_blocks.append((blocks, lr, lc, best))
        max_blocks = max(max_blocks, len(blocks))

        res = np.where(m & ~iw)[0]
        own = lc[res] < nb
        r_loc.append(lr[res[own]])
        c_loc.append(lc[res[own]])
        s_loc.append(res[own])
        r_hal.append(lr[res[~own]])
        c_hal.append(lc[res[~own]] - nb)
        s_hal.append(res[~own])
        rows_t.append(lc[res])
        cols_t.append(lr[res])
        slots_t.append(res)

    eb = block_edges
    edge_slot = np.zeros((p, max_blocks, eb), np.int32)
    slot_mask = np.zeros((p, max_blocks, eb), bool)
    lcol_b = np.full((p, max_blocks, eb), window, np.int32)
    lrow_b = np.full((p, max_blocks, eb), tile, np.int32)
    tidx_b = np.zeros((p, max_blocks), np.int32)
    for s in range(p):
        blocks, lr, lc, best = per_blocks[s]
        last_ti = 0
        for bi, (ti, sl) in enumerate(blocks):
            k = len(sl)
            edge_slot[s, bi, :k] = sl
            slot_mask[s, bi, :k] = True
            lcol_b[s, bi, :k] = lc[sl] - best[ti] * window
            lrow_b[s, bi, :k] = lr[sl] - ti * tile
            tidx_b[s, bi] = ti
            last_ti = ti
        # pad blocks carry the LAST real tile id: first_flags stays 0 so
        # the revisited-output kernels accumulate zeros instead of
        # re-initializing an earlier tile's block
        tidx_b[s, len(blocks):] = last_ti

    es = part.local_row.shape[1]
    res_mask = np.zeros((p, es), bool)
    for s in range(p):
        res_mask[s, np.concatenate([s_loc[s], s_hal[s]]).astype(np.int64)] \
            = True
    tables = dict(
        wbt_edge_slot=edge_slot, wbt_slot_mask=slot_mask,
        wbt_lcol=lcol_b, wbt_lrow=lrow_b, wbt_tile_idx=tidx_b,
        wbt_tile_win=tile_win, wbt_loc_tile=loc_tile,
        wbt_res_mask=res_mask)
    res_loc = shard_row_tiles_from(r_loc, c_loc, s_loc, nb, tile=tile)
    res_hal = shard_row_tiles_from(r_hal, c_hal, s_hal, nb, tile=tile)
    res_t = shard_row_tiles_from(rows_t, cols_t, slots_t, ext, tile=tile)
    consts = dict(window=window, tile=tile, num_tiles=t, num_windows=nw,
                  num_windows_loc=nwl, block_edges=eb, nb=nb, ext=ext)
    return tables, dict(wr_=res_loc, wh_=res_hal, wrT_=res_t), consts
