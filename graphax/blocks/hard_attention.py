"""Hard-attention block: train-time edge subsampling by attention quantile —
`HardAttODEblock` (`src/block_transformer_hard_attention.py`).

Train path: head-mean attention per edge (optionally × the feature flux
‖x_src − x_dst‖, `:45-51`), keep edges above the (1 − att_samp_pct) quantile,
renormalize kept attention by the segment sum over the norm index (+1e-16,
`:32-35`), integrate on the sparsified operator. The whole selection runs
under no_grad in the reference — reproduced with stop_gradient. Eval path:
full graph with head-mean attention (`:58-60`).

TPU-shape note: the reference physically shrinks edge_index; under jit we
keep the static edge buffer and zero the dropped edges — numerically
identical SpMM, one fixed compiled program. (A top_k-compacted variant for
bandwidth savings lives with the Pallas kernels.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphax.blocks.common import BlockOutput, integrate, make_fstate, normalize_graph
from graphax.blocks.constant import ODEBlock
from graphax.functions import (
    get_function, transformer_attention_apply, transformer_attention_init,
)
from graphax.functions.common import FuncState
from graphax.sparse.ops import EPS, segment_sum


def masked_quantile(values, mask, q):
    """torch.quantile (linear interpolation) over only the masked-true
    entries, under jit with static shapes."""
    big = jnp.where(mask, values, jnp.inf)
    sorted_vals = jnp.sort(big)
    n = jnp.sum(mask)
    pos = q * jnp.maximum(n - 1, 0).astype(values.dtype)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(values.dtype)
    return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac


def make_hard_attention_block(cfg, in_dim: int) -> ODEBlock:
    assert 0 < cfg.att_samp_pct <= 1, \
        "attention sampling threshold must be in (0,1]"
    func = get_function(cfg, in_dim)
    # function's own layer for GAT/transformer, else a block-owned
    # transformer layer (`:23-33`)
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

    def mean_attention(params, graph, x):
        """Head-mean per edge. The whole selection is no_grad in the
        reference, so the non-differentiable streaming-kernel pin applies
        on both train and eval forwards (functions.transformer
        .attention_edge_means)."""
        from graphax.functions.transformer import attention_edge_means

        if own_layer:
            return attention_edge_means(params["att_layer"], cfg, graph, x,
                                        differentiable=False)
        if cfg.function == "transformer":
            return attention_edge_means(params["func"]["att"], cfg, graph,
                                        x, differentiable=False)
        return attention_weights(params, graph, x).mean(axis=1)

    def renormalise(graph, att, keep_mask):
        index = graph.row if cfg.attention_norm_idx == 0 else graph.col
        kept = jnp.where(keep_mask, att, 0.0)
        sums = segment_sum(kept, index, graph.num_nodes)[index]
        return jnp.where(keep_mask, kept / (sums + EPS), 0.0)

    def forward(params, graph, x, *, train: bool, y=None, t1=None,
                observer=None, max_steps=None) -> BlockOutput:
        g = normalize_graph(cfg, graph)
        mean_att = mean_attention(params, g, x)        # [E]
        if train:
            mean_att = jax.lax.stop_gradient(mean_att)  # `with torch.no_grad()`
            if cfg.use_flux:
                delta = jnp.linalg.norm(x[g.row] - x[g.col], axis=-1)
                mean_att = mean_att * jax.lax.stop_gradient(delta)
            # histogram bisection, not a full-buffer sort: O(rounds·E)
            # segment-sums instead of O(E log E) per training forward —
            # matches masked_quantile (torch.quantile semantics) to bin
            # resolution ≤ range/1024² (graphax.sparse.quantile)
            from graphax.sparse.quantile import refined_masked_quantile

            thresh = refined_masked_quantile(mean_att, g.edge_mask,
                                             1.0 - cfg.att_samp_pct)
            keep = (mean_att > thresh) & g.edge_mask
            edge_vals = renormalise(g, mean_att, keep)
        else:
            edge_vals = jnp.where(g.edge_mask, mean_att, 0.0)
        fstate = make_fstate(g, x, attention=edge_vals, y=y, train=train,
                             cfg=cfg)
        return integrate(cfg, func, params["func"], fstate, x, train=train,
                         t1=t1, observer=observer, max_steps=max_steps)

    forward.attention_weights = attention_weights
    return ODEBlock(init=init, forward=forward, func=func)
