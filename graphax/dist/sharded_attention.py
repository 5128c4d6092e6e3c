"""Sharded transformer-attention diffusion (multi-chip GRAND-nl).

Extends the halo-exchange machinery to the full SDDMM → segment-softmax →
SpMM triple per RHS evaluation. Owner-computes edge placement makes every
row-indexed reduction shard-local:

- q[row] is local (rows owned by the shard);
- k[col] and x[col] come from the same halo all_to_all that the sharded
  SpMM uses — ONE exchange of the node state per NFE serves the whole RHS
  (SDDMM keys, attention values, and diffusion gathers), because q/k are
  projections of the exchanged state computed shard-locally;
- the softmax over the row index needs no communication at all.

Also provides the distributed quantile for sharded hard attention
(SURVEY §7.3 item 6): an all_gather of per-shard histograms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphax.dist.partition import EdgePartition
from graphax.dist.sharded import halo_exchange

NEG = -1e30
EPS = 1e-16


def make_sharded_attention_rhs(mesh: Mesh, part: EdgePartition, cfg,
                               axis_name: str = "graph"):
    """Returns ``rhs(att_params, alpha_beta, xs [P, Nb, D], x0s) -> dxs``
    computing the full GRAND-nl step on stacked shards.

    ``att_params``: the transformer attention param dict (replicated).

    The attention math (SDDMM → segment softmax → head-mean SpMM) is NOT
    implemented here: it delegates to the shared two-input fused kernel
    `graphax.kernels.fused_attention.fused_attention_ax` — the same code
    the production sharded model (graphax.dist.model) and the single-chip
    hot path run — so there is exactly one implementation of the sharded
    transformer RHS (VERDICT r3 #6). This wrapper only adds the halo
    exchange and the α/β combination."""
    import dataclasses

    from graphax.dist.partition import shard_row_tiles
    from graphax.kernels.fused_attention import fused_attention_ax

    # coverage gate: the shared kernel's col-normalized softmax needs the
    # transpose layout this standalone wrapper does not build, and
    # squareplus is shift-VARIANT — a per-shard max shift would make the
    # values depend on the shard count. The production model
    # (graphax.dist.model.make_sharded_gnn) handles both via its
    # cross-shard combines; use it for those configs.
    if cfg.attention_norm_idx != 0 or cfg.square_plus:
        raise NotImplementedError(
            "make_sharded_attention_rhs covers row-normalized softmax "
            "(attention_norm_idx=0, square_plus=False); use "
            "graphax.dist.model.make_sharded_gnn for col-normalized or "
            "squareplus attention")

    tiles = shard_row_tiles(part)
    tile_tpl = dataclasses.replace(
        tiles, edge_slot=tiles.edge_slot[0], slot_mask=tiles.slot_mask[0],
        col=tiles.col[0], local_row=tiles.local_row[0],
        tile_idx=tiles.tile_idx[0])
    tables = dict(
        send_idx=jnp.asarray(part.send_idx),
        halo_gather=jnp.asarray(part.halo_gather),
        edge_weight=jnp.asarray(part.edge_weight * part.edge_mask),
        t_edge_slot=tiles.edge_slot, t_slot_mask=tiles.slot_mask,
        t_col=tiles.col, t_local_row=tiles.local_row,
        t_tile_idx=tiles.tile_idx)
    tkeys = tuple(sorted(tables))
    spec = P(axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), spec, spec, {k: spec for k in tkeys}),
        out_specs=spec)
    def run(att_params, ab, xs, x0s, tbl):
        t = {k: v[0] for k, v in tbl.items()}
        x = xs[0]
        x0 = x0s[0]

        # ONE halo exchange of the raw state per evaluation
        halo = halo_exchange(x, t["send_idx"], t["halo_gather"],
                             part.num_shards, part.pair_size, axis_name)
        x_ext = jnp.concatenate([x, halo], axis=0)      # [Nb+H, D]
        tiles_local = dataclasses.replace(
            tile_tpl, edge_slot=t["t_edge_slot"],
            slot_mask=t["t_slot_mask"], col=t["t_col"],
            local_row=t["t_local_row"], tile_idx=t["t_tile_idx"])
        ax = fused_attention_ax(cfg, att_params, tiles_local, x,
                                edge_weight=t["edge_weight"], x_src=x_ext)

        alpha, beta = ab[0], ab[1]
        f = alpha * (ax - x)
        f = f + beta * x0
        return f[None]

    def rhs(att_params, alpha_beta, xs, x0s):
        return run(att_params, jnp.asarray(alpha_beta), xs, x0s, tables)

    return rhs


def distributed_masked_quantile(mesh: Mesh, axis_name: str = "graph",
                                num_bins: int = 2048):
    """Approximate global quantile over sharded per-edge values via psum'd
    histograms — the sharded form of `masked_quantile` that the distributed
    hard-attention block needs (per-shard sorts cannot see the global
    distribution)."""

    def quantile_local(values, mask, q, lo, hi):
        """Callable INSIDE shard_map: values [E_local], mask, q scalar."""
        width = (hi - lo) / num_bins
        idx = jnp.clip(((values - lo) / width).astype(jnp.int32), 0,
                       num_bins - 1)
        hist = jax.ops.segment_sum(mask.astype(jnp.float32), idx,
                                   num_segments=num_bins)
        hist = jax.lax.psum(hist, axis_name)
        total = jnp.sum(hist)
        cdf = jnp.cumsum(hist) / jnp.maximum(total, 1.0)
        bin_idx = jnp.argmax(cdf >= q)
        return lo + (bin_idx.astype(values.dtype) + 0.5) * width

    return quantile_local


def sharded_knn_candidates(mesh: Mesh, k: int, axis_name: str = "graph"):
    """Sharded kNN: each shard owns a row block of embeddings; all_gather
    the full embedding matrix (kNN is epoch-boundary work — bandwidth is
    fine), compute local top-k on the MXU (SURVEY §2.8 'sharded kNN:
    per-shard compute + allgather merge')."""

    @functools.partial(shard_map, mesh=mesh, in_specs=P(axis_name),
                       out_specs=P(axis_name))
    def run(zs):
        z_local = zs[0]                                   # [Nb, D]
        z_full = jax.lax.all_gather(z_local, axis_name, axis=0, tiled=True)
        sq_l = jnp.sum(z_local * z_local, axis=-1)
        sq_f = jnp.sum(z_full * z_full, axis=-1)
        d = sq_l[:, None] + sq_f[None, :] - 2.0 * (z_local @ z_full.T)
        _, idx = jax.lax.top_k(-d, k)
        return idx[None]                                  # [1, Nb, k]

    return run
