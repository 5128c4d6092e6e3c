"""Windowed (block-dense) transformer-attention RHS.

GRAND-nl (`function=transformer`) recomputes attention at EVERY solver
evaluation (`src/function_transformer_attention.py:44-59`), so the per-NFE
SDDMM → segment-softmax → SpMM chain is the throughput ceiling. On the
tiled path the chain is gather-bound: ``k[col]``/``x[col]`` fetch a full
sublane granule per random row (see graphax.kernels.windows).

On a community-ordered graph with the windowed layout, the in-window edges
of each 128-row output tile live in one aligned ``W``-wide column range, so
their scores are a *dense* ``Q_tile @ K_window^T`` MXU matmul masked by the
static cell-occupancy table (``WindowTiles.dense_mask``), and their value
aggregation is the same batched block matmul as the windowed SpMM
(`pallas_windows._make_win_matmul`). Only the out-of-window residual edges
(typically ~25%) pay the gather path, via the same block-layout ops as
`kernels.fused_attention`. Scores for masked cells cost FLOPs but no
bandwidth — at W=512, D≈160 the dense part runs ~2·R·W·(att+D) FLOPs per
tile regardless of edge count, far below the gather roofline.

Numerics match `kernels.fused_attention`: a single global max shift over
all real scores (dense + residual, all heads), exp/squareplus in f32,
probabilities and aggregation in the state dtype. Softmax is shift-
invariant so the global (vs per-segment) shift is exact; squareplus is
not, and the reference shifts by the global max (`src/utils.py:129-140`).

Scope: head-mean aggregation, row normalization, all four score types
plus the Beltrami product-of-Gaussians scores (feat/pos split — round 2),
softmax or squareplus; plus pre-softmax edge reweighting via the densified
weight blocks. Fully
differentiable (XLA ops + the custom-vjp window matmul), so it serves
training and eval alike.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphax.kernels.fused_attention import (
    NEG, _broadcast_rows, _onehot, _reduce_rows,
)
from graphax.kernels.pallas_windows import _make_win_matmul, _slab
from graphax.kernels.windows import WindowTiles
from graphax.utils.params import linear_apply


def _tile_view(z, wt: WindowTiles):
    """[N, F] → [T, tile, F] row-tile view (zero padded)."""
    pad = wt.padded_nodes - z.shape[0]
    return jnp.pad(z, ((0, pad), (0, 0))).reshape(wt.num_tiles, wt.tile, -1)


def _win_view(z, wt: WindowTiles):
    """[N, F] → [T, W, F]: each row tile's best column-window slab."""
    slab = _slab(z, wt.num_windows, wt.window)             # [Wn, W, F]
    return jnp.take(slab, wt.tile_win, axis=0)


def _center(z):
    return z - z.mean(axis=-1, keepdims=True)


def _unit(z, eps=1e-5):
    n = jnp.maximum(jnp.linalg.norm(z.astype(jnp.float32), axis=-1,
                                    keepdims=True), eps)
    return z.astype(jnp.float32) / n


def _dense_scores_head(cfg, p, qt, kt, h):
    """Masked-cell dense scores of head ``h``: [T, tile, W] f32 (mask NOT
    yet applied). ``qt``: [T, tile, A(+A)]; ``kt``: [T, W, A(+A)] — raw
    projection width; heads are sliced here. Beltrami carries the
    concatenated [feat-A | pos-A] projections and multiplies the two
    Gaussian kernels (`src/function_transformer_attention.py:205-222`)."""
    heads = cfg.heads

    def _sq_head(qp, kp):
        qf = qp.astype(jnp.float32)
        kf = kp.astype(jnp.float32)
        return (jnp.sum(qf * qf, -1)[:, :, None]
                + jnp.sum(kf * kf, -1)[:, None, :]
                - 2.0 * jnp.einsum("trd,twd->trw", qf, kf,
                                   preferred_element_type=jnp.float32))

    if cfg.beltrami and cfg.attention_type == "exp_kernel":
        a = qt.shape[-1] // 2
        d_k = a // heads
        sl = slice(h * d_k, (h + 1) * d_k)
        sq_x = _sq_head(qt[..., :a][..., sl], kt[..., :a][..., sl])
        sq_p = _sq_head(qt[..., a:][..., sl], kt[..., a:][..., sl])
        return (p["output_var_x"] ** 2
                * jnp.exp(-sq_x / (2 * p["lengthscale_x"] ** 2))
                * p["output_var_p"] ** 2
                * jnp.exp(-sq_p / (2 * p["lengthscale_p"] ** 2)))

    d_k = qt.shape[-1] // heads
    sl = slice(h * d_k, (h + 1) * d_k)
    q_h, k_h = qt[..., sl], kt[..., sl]
    if cfg.attention_type == "scaled_dot":
        return jnp.einsum("trd,twd->trw", q_h, k_h,
                          preferred_element_type=jnp.float32) / \
            jnp.sqrt(jnp.asarray(d_k, jnp.float32))
    if cfg.attention_type in ("cosine_sim", "pearson"):
        if cfg.attention_type == "pearson":
            q_h, k_h = _center(q_h), _center(k_h)
        return jnp.einsum("trd,twd->trw", _unit(q_h), _unit(k_h),
                          preferred_element_type=jnp.float32)
    if cfg.attention_type == "exp_kernel":
        sq = _sq_head(q_h, k_h)
        if "_ov2" in p:
            return p["_ov2"] * jnp.exp(-sq * p["_inv2l2"])
        return p["output_var"] ** 2 * jnp.exp(-sq / (2 * p["lengthscale"] ** 2))
    raise ValueError(cfg.attention_type)


def _residual_scores(cfg, p, tiles, x, q, edge_weight):
    """Block-layout per-edge scores on the residual gather layout —
    the score stage of `fused_attention.fused_attention_ax`. Returns
    (scores [B, Eb, H] f32 masked to NEG, oh, xg)."""
    heads = cfg.heads
    d_k = cfg.attention_dim // heads
    dt = x.dtype
    oh = _onehot(tiles, dt)
    xg = x[tiles.col]                                      # [B, Eb, D]
    if cfg.beltrami and cfg.attention_type == "exp_kernel":
        from graphax.kernels.fused_attention import _beltrami_scores

        s = _beltrami_scores(cfg, p, tiles, oh, x, xg)
        if cfg.reweight_attention and edge_weight is not None:
            s = s * edge_weight.astype(s.dtype)[tiles.edge_slot][..., None]
        return jnp.where(tiles.slot_mask[..., None], s, NEG), oh, xg
    q_b = _broadcast_rows(oh, q, tiles)                    # [B, Eb, att]
    kw = p["K"]["w"].astype(dt)
    kb = p["K"]["b"].astype(dt)
    k_b = jnp.einsum("bed,da->bea", xg, kw,
                     preferred_element_type=jnp.float32).astype(dt) + kb
    b, eb = q_b.shape[:2]
    q_h = q_b.reshape(b, eb, heads, d_k)
    k_h = k_b.reshape(b, eb, heads, d_k)

    if cfg.attention_type == "scaled_dot":
        s = jnp.einsum("behd,behd->beh", q_h, k_h,
                       preferred_element_type=jnp.float32) / \
            jnp.sqrt(jnp.asarray(d_k, jnp.float32))
    elif cfg.attention_type in ("cosine_sim", "pearson"):
        if cfg.attention_type == "pearson":
            q_h, k_h = _center(q_h), _center(k_h)
        s = jnp.einsum("behd,behd->beh", _unit(q_h), _unit(k_h),
                       preferred_element_type=jnp.float32)
    elif cfg.attention_type == "exp_kernel":
        sq = jnp.sum((q_h.astype(jnp.float32)
                      - k_h.astype(jnp.float32)) ** 2, axis=-1)
        if "_ov2" in p:
            s = p["_ov2"] * jnp.exp(-sq * p["_inv2l2"])
        else:
            s = p["output_var"] ** 2 * jnp.exp(-sq / (2 * p["lengthscale"] ** 2))
    else:
        raise ValueError(cfg.attention_type)

    if cfg.reweight_attention and edge_weight is not None:
        s = s * edge_weight.astype(s.dtype)[tiles.edge_slot][..., None]
    return jnp.where(tiles.slot_mask[..., None], s, NEG), oh, xg


def _transform(s, square_plus: bool):
    """Post-shift score transform: exp (softmax) or squareplus."""
    if square_plus:
        return (s + jnp.sqrt(s * s + 4.0)) / 2.0
    return jnp.exp(s)


def windowed_attention_ax(cfg, att_params, graph, x, dense_weight=None):
    """``ax = mean_heads(softmax_row(scores)) @ x`` on the windowed layout.

    ``dense_weight``: optional [T, tile, W] densified edge weights (from the
    fstate's once-per-forward `densify_windows`), required only when
    ``cfg.reweight_attention``. Returns ``[N, D]`` in x.dtype.
    """
    wt: WindowTiles = graph.windows
    p = att_params
    heads = cfg.heads
    dt = x.dtype

    if cfg.beltrami and cfg.attention_type == "exp_kernel":
        fh, ph = cfg.feat_hidden_dim, cfg.pos_enc_hidden_dim
        featx = jnp.concatenate([x[:, :fh], x[:, fh + ph:]], axis=1)
        posx = x[:, fh:fh + ph]
        q = jnp.concatenate([linear_apply(p["Qx"], featx),
                             linear_apply(p["Qp"], posx)], -1).astype(dt)
        k = jnp.concatenate([linear_apply(p["Kx"], featx),
                             linear_apply(p["Kp"], posx)], -1).astype(dt)
    else:
        q = linear_apply(p["Q"], x).astype(dt)             # [N, att]
        k = linear_apply(p["K"], x).astype(dt)
    qt = _tile_view(q, wt)                                 # [T, tile, A(+A)]
    kt = _win_view(k, wt)                                  # [T, W, A(+A)]

    s_res, oh, xg = _residual_scores(cfg, p, wt.residual, x, q,
                                     graph.edge_weight)
    dmask = wt.dense_mask != 0

    def masked(s_h):
        if cfg.reweight_attention and dense_weight is not None:
            s_h = s_h * dense_weight.astype(s_h.dtype)
        return jnp.where(dmask, s_h, NEG)

    # Stability shift. Softmax is invariant to any per-row constant, so the
    # dense part of each row shifts by its own row max (free: the whole
    # dense row lives in one [tile, W] block), floored at (residual global
    # max − 70) so the residual rescale below cannot overflow. The residual
    # scores are exponentiated ONCE against their own global max and folded
    # into each row's denominator with the per-row factor
    # exp(r0 − shift_row) — exact (both sides end up shifted by shift_row),
    # single pass over the dense scores, one live [T, R, W] buffer per head.
    # Squareplus is NOT shift-invariant and the reference shifts by the
    # global max (`src/utils.py:129-140`), so that path pays a second pass.
    r0 = jnp.max(s_res)
    r0 = jnp.where(r0 <= NEG / 2, 0.0, r0)
    if cfg.square_plus:
        gmax = r0
        for h in range(heads):
            gmax = jnp.maximum(gmax, jnp.max(masked(
                _dense_scores_head(cfg, p, qt, kt, h))))
        gmax = jnp.where(gmax <= NEG / 2, 0.0, gmax)
        r0 = gmax

    e_res = jnp.where(wt.residual.slot_mask[..., None],
                      _transform(s_res - r0, cfg.square_plus),
                      0.0).astype(dt)                      # [B, Eb, H]
    d_res = _reduce_rows(oh, e_res, wt.residual)           # [N, H] f32
    pad_n = wt.padded_nodes - wt.num_nodes
    d_res_t = jnp.pad(d_res, ((0, pad_n), (0, 0))) \
        .reshape(wt.num_tiles, wt.tile, heads)             # [T, R, H]

    # NOTE on the denominator: the reference adds 1e-16 to the per-segment
    # sum (`src/utils.py:116-127`), where it is negligible because the
    # per-segment shift makes every sum O(1). Under a shared shift, a row
    # whose max score sits k below the shift has a sum ~exp(-k) — a fixed
    # 1e-16 would perturb such rows materially, so divide-by-zero is
    # guarded with a select instead.
    pbar = jnp.zeros((wt.num_tiles, wt.tile, wt.window), jnp.float32)
    denom_res = []   # per-head residual-frame denominators d_h / scale_h
    for h in range(heads):
        s_h = masked(_dense_scores_head(cfg, p, qt, kt, h))
        if cfg.square_plus:
            shift = gmax
            scale = jnp.ones(s_h.shape[:2], jnp.float32)
            inv_scale = scale
        else:
            shift = jnp.maximum(s_h.max(axis=2), r0 - 70.0)  # [T, R]
            shift = jnp.where(shift <= NEG / 2, 0.0, shift)
            # residual terms enter this row's denominator rescaled from the
            # r0 frame to the row frame; the clamp at ±70 only fires where
            # one side is ≤ e^-10 of the other (error below f32 rounding)
            scale = jnp.exp(jnp.clip(r0 - shift, -70.0, 70.0))
            inv_scale = jnp.exp(jnp.clip(shift - r0, -70.0, 70.0))
            shift = shift[:, :, None]
        e_h = jnp.where(dmask,
                        _transform(s_h - shift, cfg.square_plus), 0.0)
        d_h = e_h.sum(axis=2) + d_res_t[:, :, h] * scale   # [T, R] f32
        pbar = pbar + e_h / jnp.where(d_h > 0, d_h, 1.0)[:, :, None]
        denom_res.append(d_h * inv_scale)    # == Σe in the r0 frame
    pbar = (pbar / heads).astype(dt)

    f = _make_win_matmul(wt.num_tiles, wt.tile, wt.window, wt.num_windows,
                         wt.num_nodes)
    out_win = f(pbar, x, wt.tile_win)                      # [N, D] f32

    denom = jnp.stack(denom_res, axis=-1) \
        .reshape(wt.padded_nodes, heads)[:wt.num_nodes]    # [N, H]
    denom_b = _broadcast_rows(oh, denom.astype(dt), wt.residual)
    denom_safe = jnp.where(denom_b > 0, denom_b, 1.0)
    w_res = jnp.where(wt.residual.slot_mask,
                      (e_res / denom_safe).mean(axis=-1), 0.0)
    vb = xg * w_res[..., None]
    out_res = _reduce_rows(oh, vb, wt.residual)            # [N, D] f32
    return (out_win + out_res).astype(dt)


def windowed_att_applicable(cfg, graph) -> bool:
    # (norm_idx=1 routes to the tiled fused path, which covers it via the
    # transpose layout — see fused_attention.py; Beltrami rides the XLA
    # windowed path here, the Pallas winatt kernel gates it out)
    return (graph.strategy == "windowed" and graph.windows is not None
            and not cfg.mix_features and not cfg.multi_modal
            and cfg.attention_norm_idx == 0)
