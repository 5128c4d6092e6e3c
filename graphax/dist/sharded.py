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


def sharded_spmm_windowed(mesh: Mesh, part: EdgePartition,
                          window: int = 512, tile: int = 128,
                          axis_name: str = "graph"):
    """Windowed (block-dense) sharded ``A @ x``: returns ``(prepare, f)``.

    ``prepare(weights=None) -> state`` densifies each shard's in-window
    edges into ``[T, tile, W]`` MXU operator blocks — ONCE per forward
    (per pinned edge-value set), not per solver evaluation.
    ``f(xs [P, Nb, D], state) -> [P, Nb, D]`` runs per NFE: halo
    all_to_all, one batched block matmul against the extended-state window
    slabs, plus a segment-sum over the (typically small) residual edge set.
    Differentiable end to end (gradients flow through prepare's scatter and
    the collectives)."""
    wtab = shard_window_tables(part, window=window, tile=tile)
    t, nbp = wtab["num_tiles"], wtab["padded_rows"]
    nw, ext, nb = wtab["num_windows"], wtab["ext"], part.block_size
    gspec = P(axis_name)

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
        wv = w[0]
        dense = jnp.zeros((nbp * window,), wv.dtype) \
            .at[fi].add(jnp.where(iw, wv, 0)) \
            .reshape(t, tile, window)
        res_vals = jnp.where(rm, wv[rs], 0)
        return dense[None], res_vals[None]

    def prepare(weights=None):
        w = base_w if weights is None else weights
        return prepare_sm(w, (flat_idx, in_win, res_slot, res_mask))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(gspec, gspec, gspec, (gspec,) * 5),
        out_specs=gspec)
    def run(xs, dense, res_vals, tbl):
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

    def f(xs, state):
        dense, res_vals = state
        return run(xs, dense, res_vals,
                   (tile_win, res_row, res_col, send_idx, halo_gather))

    return prepare, f


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
