"""Fused block-layout transformer-attention RHS for the tiled strategy.

The edge-space pipeline pays two hidden TPU taxes per NFE: random per-edge
gathers (``q[row]``, ``denominator[row]`` — ~17 ns/element) and a second
one-hot reduction for the softmax denominators. This kernel keeps the entire
SDDMM → softmax → SpMM chain in the ``[B, Eb]`` block layout of
:class:`~graphax.kernels.tiles.RowTiles`, where every row-indexed quantity
moves through 128-wide one-hot matmuls on the MXU:

- ``q[row]`` per block = ``onehot(local_row) @ q_tile`` (q rows of a block's
  tile are contiguous — block gather, not random);
- softmax denominators reduce via the one-hot and broadcast back the same
  way (no [E]-indexed gather);
- only two unavoidable random gathers remain: ``k[col]`` and ``x[col]``.

Scope: head-mean aggregation (the non-``mix_features`` path every tuned
config uses), row (attention_norm_idx=0) AND col (=1, via the transpose
layout) normalization, all four score types plus the Beltrami
product-of-Gaussians scores, softmax (global-max shift) or squareplus.
Only ``mix_features`` / ``multi_modal`` fall back to the edge-space path.
Numerics pinned by parity tests against `graphax.functions.transformer`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphax.kernels.tiles import RowTiles

NEG = -1e30
EPS = 1e-16


def _onehot(tiles: RowTiles, dtype):
    return jax.nn.one_hot(tiles.local_row, tiles.tile, dtype=dtype)


def _tile_rows(node_vals, tiles: RowTiles):
    """[N, F] → [B, tile, F]: each block's slice of its tile's rows
    (contiguous block gather)."""
    f = node_vals.shape[-1]
    pad = tiles.padded_nodes - node_vals.shape[0]
    v = jnp.pad(node_vals, ((0, pad), (0, 0)))
    return v.reshape(tiles.num_tiles, tiles.tile, f)[tiles.tile_idx]


def _broadcast_rows(oh, node_vals, tiles: RowTiles):
    """node_vals[row] in block layout: [N, F] → [B, Eb, F] via the one-hot
    matmul (MXU) instead of an [E]-indexed gather."""
    tv = _tile_rows(node_vals.astype(oh.dtype), tiles)     # [B, R, F]
    return jnp.einsum("ber,brf->bef", oh, tv,
                      preferred_element_type=jnp.float32).astype(oh.dtype)


def _reduce_rows(oh, block_vals, tiles: RowTiles):
    """Σ over row segments: [B, Eb, F] → [N, F] (one-hot matmul + small
    sorted segment-sum over blocks)."""
    part = jnp.einsum("ber,bef->brf", oh, block_vals,
                      preferred_element_type=jnp.float32)
    out = jax.ops.segment_sum(part, tiles.tile_idx,
                              num_segments=tiles.num_tiles,
                              indices_are_sorted=True)
    return out.reshape(tiles.padded_nodes, -1)[: tiles.num_nodes]


def _beltrami_split(z, fh: int, ph: int):
    """State layout [features | positional | labels] → (feat, pos) on the
    last axis (reference `src/function_transformer_attention.py:164-167`)."""
    pos = z[..., fh:fh + ph]
    feat = jnp.concatenate([z[..., :fh], z[..., fh + ph:]], axis=-1)
    return feat, pos


def _beltrami_scores(cfg, p, tiles, oh, x, xg):
    """Product-of-Gaussian-kernels Beltrami scores in block layout: the
    feature and positional halves each get their own Q/K projection and
    exp kernel; scores multiply (`src/function_transformer_attention.py:
    205-222`). Returns [B, Eb, H] f32."""
    from graphax.utils.params import linear_apply

    heads = cfg.heads
    dt = x.dtype
    fh, ph = cfg.feat_hidden_dim, cfg.pos_enc_hidden_dim
    featx, posx = _beltrami_split(x, fh, ph)
    q = jnp.concatenate([linear_apply(p["Qx"], featx),
                         linear_apply(p["Qp"], posx)], axis=-1).astype(dt)
    q_b = _broadcast_rows(oh, q, tiles)                 # [B, Eb, 2A]
    featg, posg = _beltrami_split(xg, fh, ph)

    def kproj(name, z):
        w = p[name]["w"].astype(dt)
        bb = p[name]["b"].astype(dt)
        return jnp.einsum("bed,da->bea", z, w,
                          preferred_element_type=jnp.float32).astype(dt) + bb

    kx_b, kp_b = kproj("Kx", featg), kproj("Kp", posg)
    a = kx_b.shape[-1]
    d_k = a // heads
    b, eb = q_b.shape[:2]

    def sqdist(qpart, kpart):
        qh = qpart.reshape(b, eb, heads, d_k).astype(jnp.float32)
        kh = kpart.reshape(b, eb, heads, d_k).astype(jnp.float32)
        return jnp.sum((qh - kh) ** 2, axis=-1)         # [B, Eb, H]

    sq_x = sqdist(q_b[..., :a], kx_b)
    sq_p = sqdist(q_b[..., a:], kp_b)
    return (p["output_var_x"] ** 2
            * jnp.exp(-sq_x / (2 * p["lengthscale_x"] ** 2))
            * p["output_var_p"] ** 2
            * jnp.exp(-sq_p / (2 * p["lengthscale_p"] ** 2)))


def fused_attention_ax(cfg, att_params, tiles: RowTiles, x, edge_weight=None,
                       tiles_t: RowTiles = None, x_src=None):
    """``ax = mean_heads(softmax(scores)) @ x`` fully fused in block
    layout. ``att_params`` is the transformer attention param dict (Q/K/...).
    ``attention_norm_idx=1`` (col-normalized, the Cora/Citeseer/CoauthorCS
    tuned configs — `src/best_params.py:1-2,4`) needs ``tiles_t``: the
    denominators reduce on the transpose layout (gather via
    ``perm_from_row``, never an E-sized scatter) and broadcast back with a
    col gather. Returns ``[N, D]`` in x.dtype.

    ``x_src`` (two-input form, sharded per-NFE path): a SEPARATE gather
    source for the keys/values — ``tiles.col`` then indexes ``x_src``
    (e.g. the halo-extended local state inside ``shard_map``) while q comes
    from ``x`` (the owned rows). Default: ``x`` itself."""
    from graphax.utils.params import linear_apply

    heads = cfg.heads
    d_k = cfg.attention_dim // heads
    dt = x.dtype
    beltrami = cfg.beltrami and cfg.attention_type == "exp_kernel"

    oh = _onehot(tiles, dt)                             # [B, Eb, R]
    # ONE gather of the state serves both the attention keys and the value
    # SpMM: k[col] = x[col] @ K  computed per block on the MXU
    xg = (x if x_src is None else x_src)[tiles.col]     # [B, Eb, D]

    if beltrami:
        scores = _beltrami_scores(cfg, att_params, tiles, oh, x, xg)
        b, eb = scores.shape[:2]
    else:
        q = linear_apply(att_params["Q"], x).astype(dt)  # [N, att_dim]
        q_b = _broadcast_rows(oh, q, tiles)              # [B, Eb, att]
        kw = att_params["K"]["w"].astype(dt)
        kb_bias = att_params["K"]["b"].astype(dt)
        k_b = jnp.einsum("bed,da->bea", xg, kw,
                         preferred_element_type=jnp.float32).astype(dt) \
            + kb_bias
        b, eb = q_b.shape[:2]
        q_h = q_b.reshape(b, eb, heads, d_k)
        k_h = k_b.reshape(b, eb, heads, d_k)

    if beltrami:
        pass
    elif cfg.attention_type == "scaled_dot":
        scores = jnp.einsum("behd,behd->beh", q_h, k_h,
                            preferred_element_type=jnp.float32) / \
            jnp.sqrt(jnp.asarray(d_k, jnp.float32))
    elif cfg.attention_type in ("cosine_sim", "pearson"):
        if cfg.attention_type == "pearson":
            q_h = q_h - q_h.mean(axis=-1, keepdims=True)
            k_h = k_h - k_h.mean(axis=-1, keepdims=True)
        qn = jnp.maximum(jnp.linalg.norm(q_h.astype(jnp.float32), axis=-1),
                         1e-5)
        kn = jnp.maximum(jnp.linalg.norm(k_h.astype(jnp.float32), axis=-1),
                         1e-5)
        scores = jnp.einsum("behd,behd->beh", q_h, k_h,
                            preferred_element_type=jnp.float32) / (qn * kn)
    elif cfg.attention_type == "exp_kernel":
        sq = jnp.sum((q_h.astype(jnp.float32) - k_h.astype(jnp.float32)) ** 2,
                     axis=-1)
        if "_ov2" in att_params:
            scores = att_params["_ov2"] * jnp.exp(-sq * att_params["_inv2l2"])
        else:
            scores = att_params["output_var"] ** 2 * \
                jnp.exp(-sq / (2 * att_params["lengthscale"] ** 2))
    else:
        raise ValueError(cfg.attention_type)

    if cfg.reweight_attention and edge_weight is not None:
        w_b = edge_weight.astype(scores.dtype)[tiles.edge_slot]
        scores = scores * w_b[..., None]

    mask = tiles.slot_mask[..., None]
    scores = jnp.where(mask, scores, NEG)

    if cfg.square_plus:
        gmax = jnp.max(scores)
        gmax = jnp.where(gmax <= NEG / 2, 0.0, gmax)
        e = scores - gmax
        e = (e + jnp.sqrt(e * e + 4.0)) / 2.0
    else:
        gmax = jnp.max(scores)
        gmax = jnp.where(gmax <= NEG / 2, 0.0, gmax)
        e = jnp.exp(scores - gmax)
    e = jnp.where(mask, e, 0.0).astype(dt)              # [B, Eb, H]

    # the reference's +1e-16 (`src/utils.py:127`) is negligible under its
    # per-segment shift; under the global shift used here it would be a
    # material perturbation for rows far below the global max, so rely on
    # the zero-select guard below instead
    if cfg.attention_norm_idx == 0:
        denom = _reduce_rows(oh, e, tiles)              # [N, H] f32
        denom_b = _broadcast_rows(oh, denom.astype(dt), tiles)
    else:
        # col-normalized softmax: move e onto the transpose layout with the
        # static slot permutation, reduce per col there, gather back by col
        e_t = e.reshape(b * eb, heads)[tiles_t.perm_from_row] \
            .reshape(tiles_t.col.shape + (heads,))
        e_t = jnp.where(tiles_t.slot_mask[..., None], e_t, 0.0)
        oh_t = _onehot(tiles_t, dt)
        denom = _reduce_rows(oh_t, e_t, tiles_t)        # [N, H] f32 (by col)
        denom_b = denom.astype(dt)[tiles.col]           # [B, Eb, H]
    # padded slots have an all-zero one-hot row → denom_b == 0; guard the
    # 0/0 (and its NaN gradient) explicitly
    denom_safe = jnp.where(denom_b > 0, denom_b, 1.0)
    w_mean = jnp.where(tiles.slot_mask, (e / denom_safe).mean(axis=-1), 0.0)

    vb = xg * w_mean[..., None]                         # [B, Eb, D]
    ax = _reduce_rows(oh, vb, tiles)                    # [N, D] f32
    return ax.astype(dt)


def fused_path_applicable(cfg, tiles_t=None) -> bool:
    """Configs the block-layout fused RHS covers. ``attention_norm_idx=1``
    additionally needs the transpose layout (for col denominators)."""
    if cfg.mix_features or cfg.multi_modal:
        return False
    if cfg.attention_norm_idx != 0 and tiles_t is None:
        return False
    return True
