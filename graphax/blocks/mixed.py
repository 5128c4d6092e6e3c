"""Mixed block: diffusion operator = (1−σ(γ))·attention + σ(γ)·rw adjacency
with a learnable scalar γ (init 0) — `MixedODEblock` (`src/block_mixed.py`),
pinned by `test/test_block_mixed.py:67-82`. Regularizers are not threaded
(the reference's mixed forward ignores reg states, `:37-62`)."""

from __future__ import annotations

import jax

from graphax.blocks.common import BlockOutput, integrate, make_fstate, normalize_graph
from graphax.blocks.constant import ODEBlock
from graphax.functions import (
    get_function, transformer_attention_apply, transformer_attention_init,
)
from graphax.functions.common import FuncState
import jax.numpy as jnp


def make_mixed_block(cfg, in_dim: int) -> ODEBlock:
    func = get_function(cfg, in_dim)
    cfg_noreg = cfg.replace(kinetic_energy=None, jacobian_norm2=None,
                            total_deriv=None, directional_penalty=None)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {"func": func.init(k1),
                "att_layer": transformer_attention_init(k2, cfg, in_dim),
                "gamma": jnp.zeros(())}

    def mixed_attention(params, graph, x, differentiable: bool = True):
        from graphax.functions.transformer import attention_edge_means

        gamma = jax.nn.sigmoid(params["gamma"])
        mean = attention_edge_means(params["att_layer"], cfg, graph, x,
                                    differentiable=differentiable)
        return mean * (1 - gamma) + graph.edge_weight * gamma

    def forward(params, graph, x, *, train: bool, y=None, t1=None,
                observer=None, max_steps=None) -> BlockOutput:
        g = normalize_graph(cfg, graph)
        # pinned mix only drives the laplacian RHS; transformer/GAT
        # recompute per NFE and ignore it (dead compute in the reference —
        # see blocks/attention.py)
        att = mixed_attention(params, g, x, differentiable=train) \
            if cfg.function == "laplacian" else None
        fstate = make_fstate(g, x, attention=att, train=train, y=y,
                             cfg=cfg)
        return integrate(cfg_noreg, func, params["func"], fstate, x,
                         train=train, t1=t1, observer=observer,
                         max_steps=max_steps)

    forward.mixed_attention = mixed_attention
    return ODEBlock(init=init, forward=forward, func=func)
