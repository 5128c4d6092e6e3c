"""Pallas TPU kernel for the windowed (block-dense) attention RHS.

Fuses, per 128-row output tile, the ENTIRE dense part of the per-NFE
attention recompute (see `graphax.kernels.windowed_attention` for the
algorithm and shift/rescale math): masked ``Q_tile @ K_window^T`` scores,
per-row shifted softmax combined with the precomputed residual-path
denominators, head-mean, and the ``P̄ @ X_window`` value aggregation — all
in VMEM. The XLA formulation of the same math materializes several
``[T, 128, W]`` f32 intermediates in HBM per head (measured: it loses to
the tiled gather path at arxiv scale despite doing ~40x fewer gathers);
this kernel's HBM traffic per tile is just the K/X window slabs (sequential,
shared across the tile's rows), the mask block, and the output tile.

The residual (out-of-window) edges stay on the XLA block-layout path, which
also produces the per-row residual denominators this kernel consumes and
consumes the per-row combined denominators this kernel emits (both in the
residual-global-max frame, rescaled per row inside the kernel).

Softmax only — squareplus needs a global max over all scores (a second
pass); that configuration routes to the XLA windowed path. Backward =
custom_vjp replaying `windowed_attention_ax` (XLA, differentiable), so the
path serves training too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphax.kernels.fused_attention import NEG
from graphax.kernels.pallas_tiled import _f0, _interpret
from graphax.kernels.windows import WindowTiles
from graphax.utils.params import linear_apply

COS_EPS = 1e-5


def _make_winatt_kernel(att_type: str, reweight: bool, heads: int,
                        d_k: int, out_dtype):
    """Kernel over grid [T]: one output tile per step."""

    def kernel(wi_ref, q_ref, k_ref, x_ref, m_ref, dres_ref, scal_ref,
               *rest):
        # pallas passes inputs before outputs: rest is
        # ([w_ref when reweight], o_ref, dout_ref)
        w_ref = rest[0] if len(rest) == 3 else None
        o_ref, dout_ref = rest[-2:]
        q = q_ref[0]                                       # [R, att] dt
        k = k_ref[0]                                       # [W, att] dt
        xs = x_ref[0]                                      # [W, D] dt
        m = m_ref[0] != 0                                  # [R, W] bool
        r0 = scal_ref[0, 2]
        r, w = m.shape
        pbar = jnp.zeros((r, w), jnp.float32)

        for h in range(heads):
            q_h = q[:, h * d_k:(h + 1) * d_k]
            k_h = k[:, h * d_k:(h + 1) * d_k]
            if att_type == "scaled_dot":
                s = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) / \
                    np.float32(np.sqrt(d_k))
            elif att_type in ("cosine_sim", "pearson"):
                qf = q_h.astype(jnp.float32)
                kf = k_h.astype(jnp.float32)
                if att_type == "pearson":
                    qf = qf - jnp.mean(qf, axis=1, keepdims=True)
                    kf = kf - jnp.mean(kf, axis=1, keepdims=True)
                qn = jnp.maximum(jnp.sqrt(jnp.sum(qf * qf, 1)), COS_EPS)
                kn = jnp.maximum(jnp.sqrt(jnp.sum(kf * kf, 1)), COS_EPS)
                s = jax.lax.dot_general(
                    qf, kf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) / \
                    (qn[:, None] * kn[None, :])
            elif att_type == "exp_kernel":
                ov2 = scal_ref[0, 0]
                inv2l2 = scal_ref[0, 1]
                qf = q_h.astype(jnp.float32)
                kf = k_h.astype(jnp.float32)
                sq = (jnp.sum(qf * qf, 1)[:, None]
                      + jnp.sum(kf * kf, 1)[None, :]
                      - 2.0 * jax.lax.dot_general(
                          qf, kf, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32))
                s = ov2 * jnp.exp(-sq * inv2l2)
            else:
                raise ValueError(att_type)
            if reweight:
                s = s * w_ref[0].astype(jnp.float32)
            s = jnp.where(m, s, NEG)

            shift = jnp.maximum(jnp.max(s, axis=1), r0 - 70.0)   # [R]
            shift = jnp.where(shift <= NEG / 2, 0.0, shift)
            e = jnp.where(m, jnp.exp(s - shift[:, None]), 0.0)
            scale = jnp.exp(jnp.clip(r0 - shift, -70.0, 70.0))
            d = jnp.sum(e, axis=1) + dres_ref[0, h] * scale      # [R]
            pbar += e / jnp.where(d > 0, d, 1.0)[:, None]
            dout_ref[0, h] = d * jnp.exp(jnp.clip(shift - r0, -70.0, 70.0))

        o_ref[0] = jax.lax.dot_general(
            (pbar * (1.0 / heads)).astype(out_dtype), xs,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    return kernel


def _winatt_call(att_type, reweight, heads, d_k, q_tiles, k_slab, x_slab,
                 mask, d_res, scal, tile_win, dense_w):
    t, r, a = q_tiles.shape
    wn, w, d = x_slab.shape
    in_specs = [
        pl.BlockSpec((1, r, a), lambda i, wi: (i, 0, 0)),
        pl.BlockSpec((1, w, a), lambda i, wi: (wi[i], 0, 0)),
        pl.BlockSpec((1, w, d), lambda i, wi: (wi[i], 0, 0)),
        pl.BlockSpec((1, r, w), lambda i, wi: (i, 0, 0)),
        pl.BlockSpec((1, heads, r), lambda i, wi: (i, 0, 0)),
        pl.BlockSpec((1, 4), lambda i, wi: (0, 0)),
    ]
    args = [q_tiles, k_slab, x_slab, mask, d_res, scal]
    if reweight:
        in_specs.append(pl.BlockSpec((1, r, w), lambda i, wi: (i, 0, 0)))
        args.append(dense_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, r, d), lambda i, wi: (i, 0, 0)),
            pl.BlockSpec((1, heads, r), lambda i, wi: (i, 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_winatt_kernel(att_type, reweight, heads, d_k,
                            q_tiles.dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, r, d), jnp.float32),
            jax.ShapeDtypeStruct((t, heads, r), jnp.float32),
        ],
        interpret=_interpret(),
    )(tile_win, *args)


def _slab_pad(z, num_windows: int, window: int):
    pad = num_windows * window - z.shape[0]
    return jnp.pad(z, ((0, pad), (0, 0))).reshape(num_windows, window, -1)


@functools.lru_cache(maxsize=None)
def _make_winatt(cfg, num_tiles, tile, window, num_windows, block_edges,
                 num_nodes):
    from graphax.kernels.windowed_attention import windowed_attention_ax

    heads = cfg.heads
    d_k = cfg.attention_dim // heads

    def _forward(att_params, x, edge_weight, dense_w, wt):
        from graphax.kernels.pallas_attention import (
            SCAL_N, _attspmm_call, _norm_call, _scores_call,
        )
        from graphax.kernels.pallas_tiled import presence_scale

        dt = x.dtype
        res = wt.residual
        q = linear_apply(att_params["Q"], x).astype(dt)    # [N, att]
        k = linear_apply(att_params["K"], x).astype(dt)
        pad_rows = num_tiles * tile - num_nodes
        q_tiles = jnp.pad(q, ((0, pad_rows), (0, 0))) \
            .reshape(num_tiles, tile, -1)
        k_slab = _slab_pad(k, num_windows, window)
        x_slab = _slab_pad(x, num_windows, window)

        # ---- residual path: the streaming block-layout kernels ----------
        # (`kernels.pallas_attention`), sharing ONE x[col] gather
        if cfg.attention_type == "scaled_dot":
            q_s = q / jnp.sqrt(jnp.asarray(d_k, jnp.float32)).astype(dt)
            q_s_tiles = jnp.pad(q_s, ((0, pad_rows), (0, 0))) \
                .reshape(num_tiles, tile, -1)
        else:
            q_s_tiles = q_tiles
        xg = x[res.col]                                    # [B, Eb, D]
        wk = att_params["K"]["w"].astype(dt)
        bk = att_params["K"]["b"].astype(jnp.float32)[None, :]
        if cfg.reweight_attention:
            wb = jnp.where(res.slot_mask, edge_weight[res.edge_slot], 0) \
                .astype(jnp.float32)
        else:
            wb = jnp.zeros(res.edge_slot.shape, jnp.float32)
        if cfg.attention_type == "exp_kernel":
            if "_ov2" in att_params:
                ov2, inv2l2 = att_params["_ov2"], att_params["_inv2l2"]
            else:
                ov2 = att_params["output_var"] ** 2
                inv2l2 = 1.0 / (2.0 * att_params["lengthscale"] ** 2)
            scal2 = jnp.zeros((1, SCAL_N), jnp.float32) \
                .at[0, 0].set(ov2).at[0, 1].set(inv2l2)
        else:
            scal2 = jnp.zeros((1, SCAL_N), jnp.float32)

        present = presence_scale(res.tile_idx, num_tiles) > 0
        s_res, rmax = _scores_call(
            cfg.attention_type, bool(cfg.reweight_attention), heads,
            q_s_tiles, xg, wk, bk, wb, res.local_row, res.tile_idx, scal2,
            num_tiles, tile)                               # [B,H,Eb],[T,H,R]
        rmax = jnp.where(present[:, None, None], rmax, NEG)
        r0 = jnp.max(rmax)
        r0 = jnp.where(r0 <= NEG / 2, 0.0, r0)
        shift_r0 = jnp.full((num_tiles, heads, tile), r0, jnp.float32)
        e_res, d_res = _norm_call(False, s_res, shift_r0, res.local_row,
                                  res.tile_idx, num_tiles, tile)
        d_res = jnp.where(present[:, None, None], d_res, 0.0)

        # ---- dense in-window part: fused kernel --------------------------
        if cfg.attention_type == "exp_kernel":
            scal = jnp.stack([scal2[0, 0], scal2[0, 1], r0,
                              jnp.zeros_like(r0)])
        else:
            z = jnp.zeros_like(r0)
            scal = jnp.stack([z, z, r0, z])
        scal = scal.reshape(1, 4).astype(jnp.float32)

        out_win, denom_hr = _winatt_call(
            cfg.attention_type, bool(cfg.reweight_attention), heads, d_k,
            q_tiles, k_slab, x_slab, wt.dense_mask, d_res, scal,
            wt.tile_win, dense_w)
        out_win = out_win.reshape(num_tiles * tile, -1)[:num_nodes]

        # ---- residual aggregation vs the combined r0-frame denominators -
        out_res = _attspmm_call(e_res, denom_hr, xg, res.local_row,
                                res.tile_idx, num_tiles, tile)
        out_res = jnp.where(present[:, None, None], out_res, 0.0) \
            .reshape(num_tiles * tile, -1)[:num_nodes]
        return (out_win + out_res).astype(dt)

    @jax.custom_vjp
    def f(att_params, x, edge_weight, dense_w, wt):
        return _forward(att_params, x, edge_weight, dense_w, wt)

    def fwd(att_params, x, edge_weight, dense_w, wt):
        return _forward(att_params, x, edge_weight, dense_w, wt), \
            (att_params, x, edge_weight, dense_w, wt)

    def bwd(res, g):
        att_params, x, edge_weight, dense_w, wt = res
        import dataclasses as dc

        from graphax.sparse.graph import Graph

        graph = Graph(row=jnp.zeros((1,), jnp.int32),
                      col=jnp.zeros((1,), jnp.int32),
                      edge_weight=edge_weight,
                      num_edges=jnp.asarray(edge_weight.shape[0], jnp.int32),
                      num_nodes=num_nodes, windows=wt, strategy="windowed")
        _, vjp = jax.vjp(
            lambda p, xx, ew, dw: windowed_attention_ax(
                cfg, p, dc.replace(graph, edge_weight=ew), xx,
                dense_weight=dw if cfg.reweight_attention else None),
            att_params, x, edge_weight, dense_w)
        dp, dx, dew, ddw = vjp(g.astype(x.dtype))
        zeros_wt = jax.tree_util.tree_map(_f0, wt)
        return dp, dx, dew, ddw, zeros_wt

    f.defvjp(fwd, bwd)
    return f


def windowed_attention_ax_pallas(cfg, att_params, graph, x,
                                 dense_weight=None):
    """Fused Pallas version of
    `windowed_attention.windowed_attention_ax` (softmax, head-mean,
    row-normalized). Differentiable via an XLA replay backward."""
    wt: WindowTiles = graph.windows
    f = _make_winatt(cfg, wt.num_tiles, wt.tile, wt.window, wt.num_windows,
                     wt.block_edges, wt.num_nodes)
    if dense_weight is None:  # keep the custom_vjp signature array-typed
        dense_weight = jnp.zeros((wt.num_tiles, wt.tile, wt.window), x.dtype)
    return f(att_params, x, graph.edge_weight, dense_weight, wt)


# Test hook, mirroring pallas_tiled.FORCE
FORCE = False


def pallas_winatt_ok(cfg, graph, x) -> bool:
    # (Beltrami stays on the XLA windowed path — kernels.windowed_attention)
    return (graph.strategy == "windowed" and graph.windows is not None
            and not cfg.square_plus and x.ndim == 2
            and not (cfg.beltrami and cfg.attention_type == "exp_kernel")
            and (jax.default_backend() == "tpu" or FORCE))
