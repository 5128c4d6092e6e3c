"""GRAND-nl: sparse transformer attention diffusion.

Functional twin of `SpGraphTransAttentionLayer` + `ODEFuncTransformerAtt`
(`src/function_transformer_attention.py`): Q/K/V projections into
``attention_dim`` split over ``heads``, per-edge SDDMM scores with four score
types (scaled_dot / cosine_sim / pearson / exp_kernel), Beltrami feature/
positional split with multiplied Gaussian kernels, optional pre-softmax edge
reweighting, segment softmax or squareplus normalization over the
``attention_norm_idx`` endpoint, then mean-head SpMM (or per-head SpMM +
Wout projection under ``mix_features``).

Note (SURVEY §8): the fork's scaled_dot collapses to an O(E²) matmul-sum —
an acknowledged bug vs upstream; the per-edge dot-product intent is
implemented, pinned by the uniform-attention-at-init test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphax.functions.common import (
    DiffusionFunction, FuncState, apply_alpha_beta, cross_modal_init,
    cross_modal_apply, init_alpha_beta,
)
from graphax.kernels.dispatch import (
    attention_spmm_auto, segment_softmax_auto, spmm_multihead_auto,
    squareplus_auto,
)
from graphax.utils.params import linear_apply, linear_init

COS_EPS = 1e-5  # torch.nn.CosineSimilarity eps (`:251`)


# ----------------------------------------------------------------------
# Attention layer
# ----------------------------------------------------------------------

def transformer_attention_init(key, cfg, in_dim: int) -> dict:
    """Weights constant 1e-5 (Q≈K ⇒ uniform attention at init, `:153-157`),
    torch-default biases."""
    keys = jax.random.split(key, 16)
    att_dim = cfg.attention_dim
    p: dict = {}
    if cfg.beltrami and cfg.attention_type == "exp_kernel":
        feat_in = in_dim - cfg.pos_enc_hidden_dim
        pos_in = cfg.pos_enc_hidden_dim
        for i, name in enumerate(("Qx", "Kx", "Vx")):
            p[name] = linear_init(keys[i], feat_in, att_dim, "const", 1e-5)
        for i, name in enumerate(("Qp", "Kp", "Vp")):
            p[name] = linear_init(keys[3 + i], pos_in, att_dim, "const", 1e-5)
        p["output_var_x"] = jnp.ones(())
        p["lengthscale_x"] = jnp.ones(())
        p["output_var_p"] = jnp.ones(())
        p["lengthscale_p"] = jnp.ones(())
        if cfg.multi_modal:
            p["cross"] = cross_modal_init(keys[6], feat_in,
                                          cfg.second_modality_dim)
            kq, kk, kv = jax.random.split(keys[7], 3)
            p["cross_p"] = {
                "Q2": linear_init(kq, pos_in, pos_in, "const", 1e-5),
                "K2": linear_init(kk, cfg.second_modality_dim, pos_in, "const", 1e-5),
                "V2": linear_init(kv, cfg.second_modality_dim, pos_in, "const", 1e-5),
            }
    else:
        for i, name in enumerate(("Q", "K", "V")):
            p[name] = linear_init(keys[i], in_dim, att_dim, "const", 1e-5)
        if cfg.attention_type == "exp_kernel":
            p["output_var"] = jnp.ones(())
            p["lengthscale"] = jnp.ones(())
        if cfg.multi_modal:
            p["cross"] = cross_modal_init(keys[6], in_dim,
                                          cfg.second_modality_dim)
    p["Wout"] = linear_init(keys[8], att_dim // cfg.heads, in_dim, "const", 1e-5)
    return p


def _split_heads(z, heads: int):
    """[N, att_dim] → [N, H, Dh] — head-major split, matching the reference's
    view(n, -1, h, d_k) factorization (`:230-238`)."""
    n, att_dim = z.shape
    return z.reshape(n, heads, att_dim // heads)


def _edge_scores(cfg, q_src, k_dst, p):
    """Per-edge per-head scores from gathered q[row], k[col]: ``[E, H, Dh] →
    [E, H]`` (`:246-259`)."""
    d_k = q_src.shape[-1]
    if cfg.attention_type == "scaled_dot":
        return jnp.einsum("ehd,ehd->eh", q_src,
                          k_dst / jnp.sqrt(jnp.asarray(d_k, k_dst.dtype)))
    if cfg.attention_type == "cosine_sim":
        return _cosine(q_src, k_dst)
    if cfg.attention_type == "pearson":
        q_c = q_src - q_src.mean(axis=-1, keepdims=True)
        k_c = k_dst - k_dst.mean(axis=-1, keepdims=True)
        return _cosine(q_c, k_c)
    if cfg.attention_type == "exp_kernel":
        sq = jnp.sum((q_src - k_dst) ** 2, axis=-1)
        if "_ov2" in p:
            return p["_ov2"] * jnp.exp(-sq * p["_inv2l2"])
        return p["output_var"] ** 2 * jnp.exp(-sq / (2 * p["lengthscale"] ** 2))
    raise ValueError(f"unknown attention_type {cfg.attention_type!r}")


def _cosine(a, b):
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), COS_EPS)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), COS_EPS)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def transformer_attention_apply(params, cfg, graph, x, y=None):
    """Returns (attention ``[E, H]`` normalized over real edges, aux) where
    aux = (v ``[N, H, Dh]`` or None, raw scores ``[E, H]``)."""
    heads = cfg.heads
    row, col = graph.row, graph.col

    if cfg.beltrami and cfg.attention_type == "exp_kernel":
        # State layout [features | positional | labels] (`:164-167`).
        fh = cfg.feat_hidden_dim
        ph = cfg.pos_enc_hidden_dim
        pos = x[:, fh:fh + ph]
        feat = jnp.concatenate([x[:, :fh], x[:, fh + ph:]], axis=1)
        if cfg.multi_modal and y is not None:
            feat = cross_modal_apply(params["cross"], feat, y)
            pos = cross_modal_apply(params["cross_p"], pos, y)
        qx = _split_heads(linear_apply(params["Qx"], feat), heads)
        kx = _split_heads(linear_apply(params["Kx"], feat), heads)
        qp = _split_heads(linear_apply(params["Qp"], pos), heads)
        kp = _split_heads(linear_apply(params["Kp"], pos), heads)
        sq_x = jnp.sum((qx[row] - kx[col]) ** 2, axis=-1)
        sq_p = jnp.sum((qp[row] - kp[col]) ** 2, axis=-1)
        prods = (params["output_var_x"] ** 2
                 * jnp.exp(-sq_x / (2 * params["lengthscale_x"] ** 2))
                 * params["output_var_p"] ** 2
                 * jnp.exp(-sq_p / (2 * params["lengthscale_p"] ** 2)))
        v = None
    else:
        if cfg.multi_modal and y is not None:
            x = cross_modal_apply(params["cross"], x, y)
        q = _split_heads(linear_apply(params["Q"], x), heads)
        k = _split_heads(linear_apply(params["K"], x), heads)
        v = _split_heads(linear_apply(params["V"], x), heads)
        prods = _edge_scores(cfg, q[row], k[col], params)

    if cfg.reweight_attention:
        prods = prods * graph.edge_weight[:, None]

    is_row = cfg.attention_norm_idx == 0
    mask = graph.edge_mask
    if cfg.square_plus:
        attention = squareplus_auto(graph, prods, is_row, mask)
    else:
        attention = segment_softmax_auto(graph, prods, is_row, mask)
    return attention, (v, prods)


# ----------------------------------------------------------------------
# RHS
# ----------------------------------------------------------------------

def attention_edge_means(params, cfg, graph, x, *, differentiable: bool,
                         y=None):
    """Head-mean normalized attention per edge ``[E]`` — the block-level
    pinning value (`AttODEblock` / mixed / hard blocks pin
    ``att.mean(heads)`` once per forward,
    `src/block_transformer_attention.py:24-31`).

    When no gradient is required (eval forwards; the hard block's no_grad
    selection) and the layout/config allow, this rides the streaming
    Pallas scores+normalize kernels — measured at ogbn-arxiv scale the XLA
    per-edge pin costs 538 ms, MORE than the whole 16-NFE fused solve
    (scripts/profile_fwd_breakdown.py); the kernel path is ~20 ms.
    Otherwise: the differentiable XLA per-edge apply."""
    if (not differentiable and y is None
            and getattr(graph, "tiles", None) is not None
            and graph.strategy == "tiled"
            and jax.default_backend() == "tpu"):
        from graphax.kernels.pallas_attention import (
            attention_edge_means_pallas, attention_means_supported,
        )

        if attention_means_supported(cfg):
            return attention_edge_means_pallas(
                cfg, params, graph.tiles, x,
                int(graph.edge_buffer_size),
                edge_weight=graph.edge_weight).astype(x.dtype)
    att, _ = transformer_attention_apply(params, cfg, graph, x, y=y)
    return att.mean(axis=1)


def multiply_attention(params, cfg, graph, x, attention, v):
    """`ODEFuncTransformerAtt.multiply_attention` (`:20-42`)."""
    if cfg.mix_features:
        vx = spmm_multihead_auto(graph, attention * graph.edge_mask[:, None],
                                 v).mean(axis=1)               # [N, Dh]
        return linear_apply(params["Wout"], vx)
    return attention_spmm_auto(graph, attention, x, mask=graph.edge_mask)


def dense_rhs_ax(params, cfg, graph, x, y=None):
    """Fully dense attention RHS step (dense strategy, non-Beltrami): masked
    QKᵀ softmax on the MXU, per-NFE — see graphax.kernels.dense_path. On
    TPU at sizes where materializing the [H, N, N] scores is expensive, the
    Pallas flash kernel streams the softmax instead
    (graphax.kernels.pallas_ops)."""
    from graphax.kernels.dense_path import dense_transformer_attention

    p = params
    if cfg.multi_modal and y is not None:
        x_att = cross_modal_apply(p["cross"], x, y)
    else:
        x_att = x
    q = _split_heads(linear_apply(p["Q"], x_att), cfg.heads)
    k = _split_heads(linear_apply(p["K"], x_att), cfg.heads)

    n = graph.num_nodes
    use_flash = (jax.default_backend() == "tpu"
                 and cfg.attention_type == "scaled_dot"
                 and cfg.attention_norm_idx == 0
                 and not cfg.square_plus and not cfg.mix_features
                 and not cfg.reweight_attention
                 and n * n * cfg.heads * 4 > (1 << 28))
    if use_flash:
        from graphax.kernels.dense_path import dense_adjacency_mask
        from graphax.kernels.pallas_ops import flash_attention_multihead

        d_k = cfg.attention_dim // cfg.heads
        scale = 1.0 / jnp.sqrt(jnp.asarray(d_k, x.dtype))
        mask = dense_adjacency_mask(graph)
        out = flash_attention_multihead(q * scale, k, x, mask)  # [H, N, D]
        return out.mean(axis=0).astype(x.dtype)
    att, _mask = dense_transformer_attention(p, cfg, graph, q, k)  # [H,N,N]
    if cfg.mix_features:
        v = _split_heads(linear_apply(p["V"], x_att), cfg.heads)
        vt = jnp.moveaxis(v, 1, 0)                                 # [H,N,Dh]
        vx = jnp.einsum("hnm,hmd->hnd", att, vt,
                        preferred_element_type=jnp.float32) \
            .mean(axis=0).astype(x.dtype)
        return linear_apply(p["Wout"], vx)
    mean_att = att.mean(axis=0)
    return jnp.matmul(mean_att.astype(x.dtype), x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _windowed_att_ok(cfg, fstate, x) -> bool:
    """Route the per-NFE attention RHS through the block-dense windowed
    layout (community-ordered graphs; graphax.kernels.windowed_attention)."""
    from graphax.kernels.pallas_windows import pallas_windowed_ok
    from graphax.kernels.windowed_attention import windowed_att_applicable

    g = fstate.graph
    ok = (windowed_att_applicable(cfg, g) and pallas_windowed_ok(g, x))
    if cfg.reweight_attention and fstate.wb is None:
        return False  # dense cells could not be reweighted consistently
    return ok


def make_transformer(cfg, in_dim: int) -> DiffusionFunction:
    def init(key):
        k1, k2 = jax.random.split(key)
        params = init_alpha_beta(cfg)
        params["att"] = transformer_attention_init(k1, cfg, in_dim)
        return params

    def attention_fn(params, fstate: FuncState, x, y=None):
        return transformer_attention_apply(params["att"], cfg, fstate.graph,
                                           x, y)

    def rhs(params, fstate: FuncState, t, x):
        from graphax.kernels.dense_path import use_dense_attention
        from graphax.kernels.fused_attention import (
            fused_attention_ax, fused_path_applicable,
        )

        g = fstate.graph
        if (use_dense_attention(g, cfg.heads)
                and not (cfg.beltrami and cfg.attention_type == "exp_kernel")):
            ax = dense_rhs_ax(params["att"], cfg, g, x, fstate.y)
        elif _windowed_att_ok(cfg, fstate, x):
            from graphax.kernels.pallas_winatt import (
                pallas_winatt_ok, windowed_attention_ax_pallas,
            )
            from graphax.kernels.windowed_attention import \
                windowed_attention_ax

            dense_w = fstate.wb[0] if (cfg.reweight_attention
                                       and fstate.wb is not None) else None
            if pallas_winatt_ok(cfg, g, x):
                ax = windowed_attention_ax_pallas(cfg, params["att"], g, x,
                                                  dense_weight=dense_w)
            else:
                ax = windowed_attention_ax(cfg, params["att"], g, x,
                                           dense_weight=dense_w)
        elif g.tiles is not None and fused_path_applicable(cfg, g.tiles_t):
            from graphax.kernels.pallas_attention import (
                fused_attention_ax_pallas, pallas_fwd_supported,
            )

            if fstate.fast_attention and pallas_fwd_supported(cfg,
                                                              g.tiles_t):
                ax = fused_attention_ax_pallas(cfg, params["att"], g.tiles,
                                               x, edge_weight=g.edge_weight,
                                               tiles_t=g.tiles_t)
            else:
                ax = fused_attention_ax(cfg, params["att"], g.tiles, x,
                                        edge_weight=g.edge_weight,
                                        tiles_t=g.tiles_t)
        else:
            attention, (v, _) = attention_fn(params, fstate, x, fstate.y)
            ax = multiply_attention(params["att"], cfg, g, x, attention, v)
        return apply_alpha_beta(params, cfg, ax, x, fstate.x0)

    return DiffusionFunction(init=init, rhs=rhs, attention_fn=attention_fn)
