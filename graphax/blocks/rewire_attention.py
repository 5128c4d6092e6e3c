"""Rewire-attention block: learned in-block rewiring —
`RewireAttODEblock` (`src/block_transformer_rewiring.py`).

Train path (`:199-216`): compute head-mean attention as a transition matrix,
densify the edge set (add random edges, `:40-63`, or 2-hop attention edges
``S_hat = ½A + ½A²``, `:65-93`), quantile-threshold the densified weights,
renormalize the kept attention (`:162-197`), and integrate on the rewired
graph. Eval path (`:218-223`): the original graph with recomputed attention.

TPU-shape redesign: the reference mutates edge_index to a data-dependent
size (and its random-edge path crashes on `cat.shape(2)` — SURVEY §8).
Under jit the rewired edge set must have static shape, so the densified
operator is formed densely ``[N, N]`` (an MXU matmul — the reference itself
densifies here) and the new topology is the static top-``E_buf`` entries via
`jax.lax.top_k`. Numerically this selects the same edges whenever the
candidate count fits the buffer. Intended for small/medium N (the only
configs using this block); large graphs use hard_attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphax.blocks.common import BlockOutput, integrate, make_fstate, normalize_graph
from graphax.blocks.constant import ODEBlock
from graphax.blocks.hard_attention import masked_quantile
from graphax.functions import (
    get_function, transformer_attention_apply, transformer_attention_init,
)
from graphax.functions.common import FuncState
from graphax.sparse.ops import EPS, segment_sum


def _dense_from_edges(graph, values):
    n = graph.num_nodes
    v = jnp.where(graph.edge_mask, values, 0.0)
    return jnp.zeros((n, n), v.dtype).at[graph.row, graph.col].add(v)


def _top_edges(dense, capacity: int):
    """Static top-`capacity` entries of a dense weighted adjacency →
    (row, col, weight, num_edges)."""
    n = dense.shape[0]
    flat = dense.reshape(-1)
    vals, idx = jax.lax.top_k(flat, capacity)
    row = (idx // n).astype(jnp.int32)
    col = (idx % n).astype(jnp.int32)
    keep = vals > 0
    num = jnp.sum(keep).astype(jnp.int32)
    return (jnp.where(keep, row, 0), jnp.where(keep, col, 0),
            jnp.where(keep, vals, 0.0), num)


def make_rewire_attention_block(cfg, in_dim: int) -> ODEBlock:
    assert 0 < cfg.att_samp_pct <= 1, \
        "attention sampling threshold must be in (0,1]"
    func = get_function(cfg, in_dim)
    own_layer = cfg.function not in ("GAT", "transformer")

    def init(key):
        k1, k2 = jax.random.split(key)
        p = {"func": func.init(k1)}
        if own_layer:
            p["att_layer"] = transformer_attention_init(k2, cfg, in_dim)
        return p

    def attention_weights(params, graph, x):
        if own_layer:
            att, _ = transformer_attention_apply(params["att_layer"], cfg,
                                                 graph, x)
        else:
            att, _ = func.attention_fn(params["func"],
                                       FuncState(graph=graph), x)
        return att

    def densify(graph, mean_att, rng):
        """Dense densified weighted adjacency (`densify_edges`, `:152-160`)."""
        a = _dense_from_edges(graph, mean_att)
        if cfg.new_edges == "k_hop_att":
            s_hat = 0.5 * a + 0.5 * (a @ a)
            s_hat = s_hat * (1.0 - jnp.eye(graph.num_nodes, dtype=a.dtype))
            return s_hat
        # 'random': add M = n·(1/(1−rw_addD) − 1) uniform edges of weight ~0+
        m = max(int(graph.num_nodes * (1.0 / (1.0 - cfg.rw_addD) - 1.0)), 1)
        r = jax.random.randint(rng, (2, m), 0, graph.num_nodes)
        small = jnp.full((m,), 1e-6, a.dtype)  # present but weakly weighted
        return a.at[r[0], r[1]].add(jnp.where(a[r[0], r[1]] > 0, 0.0, small))

    def renormalise(graph, att):
        index = graph.row if cfg.attention_norm_idx == 0 else graph.col
        kept = jnp.where(graph.edge_mask, att, 0.0)
        sums = segment_sum(kept, index, graph.num_nodes)[index]
        return jnp.where(graph.edge_mask, kept / (sums + EPS), 0.0)

    def forward(params, graph, x, *, train: bool, y=None, t1=None,
                observer=None, rng=None, max_steps=None) -> BlockOutput:
        g = normalize_graph(cfg, graph)
        att = attention_weights(params, g, x).mean(axis=1)
        if train:
            att = jax.lax.stop_gradient(att)
            if rng is None:
                rng = jax.random.PRNGKey(0)
            dense = densify(g, att, rng)
            row, col, w, num = _top_edges(dense, g.edge_buffer_size)
            g2 = g.with_edges(row, col, w, num)
            # quantile threshold on the densified weights, keep the rest
            # (`threshold_edges`, `:162-197`) at att_samp_pct retention
            thresh = masked_quantile(w, g2.edge_mask, 1.0 - cfg.att_samp_pct)
            keep = (w > thresh) & g2.edge_mask
            g2 = g2.with_edges(jnp.where(keep, row, 0),
                               jnp.where(keep, col, 0),
                               jnp.where(keep, w, 0.0),
                               jnp.sum(keep).astype(jnp.int32))
            edge_vals = renormalise(g2, g2.edge_weight)
            g_run = g2
        else:
            edge_vals = jnp.where(g.edge_mask, att, 0.0)
            g_run = g
        fstate = make_fstate(g_run, x, attention=edge_vals, y=y,
                              train=train, cfg=cfg)
        return integrate(cfg, func, params["func"], fstate, x, train=train,
                         t1=t1, observer=observer, max_steps=max_steps)

    forward.attention_weights = attention_weights
    return ODEBlock(init=init, forward=forward, func=func)
