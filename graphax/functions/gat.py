"""GAT-style attention diffusion.

Functional twin of `SpGraphAttentionLayer` + `ODEFuncAtt`
(`src/function_GAT_attention.py`): shared projection W into attention_dim,
per-edge scores ``LeakyReLU(a · [h_src ‖ h_dst])`` with a single ``a`` vector
shared across heads (`:105,123-135`), segment softmax over the
``attention_norm_idx`` endpoint, per-head SpMM averaged over heads
(optionally on Wx with a Wout mix, `:27-48`), then ``α(ax−x)+βx0``.
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
)
from graphax.utils.params import xavier_normal


def gat_attention_init(key, cfg, in_dim: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    att_dim = cfg.attention_dim
    d_k = att_dim // cfg.heads
    p = {
        # torch shapes: W [in, att_dim], Wout [att_dim, in], a (1, 2dk, 1, 1)
        "W": xavier_normal(k1, (in_dim, att_dim), gain=1.414),
        "Wout": xavier_normal(k2, (att_dim, in_dim), gain=1.414),
        "a": xavier_normal(k3, (1, 2 * d_k, 1, 1), gain=1.414).reshape(2 * d_k),
    }
    if cfg.multi_modal:
        p["cross"] = cross_modal_init(k4, in_dim, cfg.second_modality_dim)
    return p


def gat_attention_apply(params, cfg, graph, x, y=None):
    """Returns (attention [E, H], wx [N, att_dim])."""
    if cfg.multi_modal and y is not None:
        x = cross_modal_apply(params["cross"], x, y)
    wx = x @ params["W"]                                     # [N, att_dim]
    d_k = cfg.attention_dim // cfg.heads
    h = wx.reshape(x.shape[0], cfg.heads, d_k)               # [N, H, Dh]
    a1, a2 = params["a"][:d_k], params["a"][d_k:]
    # score[e,h] = leakyrelu(a1·h[row] + a2·h[col]) — `a` shared over heads
    scores = jnp.einsum("ehd,d->eh", h[graph.row], a1) + \
        jnp.einsum("ehd,d->eh", h[graph.col], a2)
    scores = jax.nn.leaky_relu(scores, negative_slope=cfg.leaky_relu_slope)
    attention = segment_softmax_auto(graph, scores,
                                     cfg.attention_norm_idx == 0,
                                     graph.edge_mask)
    return attention, wx


def make_gat(cfg, in_dim: int) -> DiffusionFunction:
    def init(key):
        params = init_alpha_beta(cfg)
        params["att"] = gat_attention_init(jax.random.split(key)[0], cfg, in_dim)
        return params

    def attention_fn(params, fstate: FuncState, x, y=None):
        return gat_attention_apply(params["att"], cfg, fstate.graph, x, y)

    def rhs(params, fstate: FuncState, t, x):
        g = fstate.graph
        attention, wx = attention_fn(params, fstate, x, fstate.y)
        if cfg.mix_features:
            # per-head SpMM over the full Wx, heads broadcast (`:31-38`)
            att_m = attention * g.edge_mask[:, None]
            wx_h = jnp.broadcast_to(wx[:, None, :],
                                    (wx.shape[0], cfg.heads, wx.shape[1]))
            mixed = spmm_multihead_auto(g, att_m, wx_h).mean(axis=1)
            ax = mixed @ params["att"]["Wout"]
        else:
            ax = attention_spmm_auto(g, attention, x, mask=g.edge_mask)
        return apply_alpha_beta(params, cfg, ax, x, fstate.x0)

    return DiffusionFunction(init=init, rhs=rhs, attention_fn=attention_fn)
