"""Constant block: fixed (normalized-adjacency) diffusion operator over the
whole solve — `ConstantODEblock` (`src/block_constant.py`)."""

from __future__ import annotations

from typing import NamedTuple

import jax

from graphax.blocks.common import BlockOutput, integrate, make_fstate, normalize_graph
from graphax.functions import get_function
from graphax.functions.common import FuncState


class ODEBlock(NamedTuple):
    init: callable       # key -> params
    forward: callable    # (params, graph, x, *, train, y=None, t1=None,
    #                       observer=None) -> BlockOutput
    func: object         # the underlying DiffusionFunction


def make_constant_block(cfg, in_dim: int) -> ODEBlock:
    func = get_function(cfg, in_dim)

    def init(key):
        return {"func": func.init(key)}

    def forward(params, graph, x, *, train: bool, y=None, t1=None,
                observer=None, max_steps=None) -> BlockOutput:
        g = normalize_graph(cfg, graph)
        fstate = make_fstate(g, x, y=y, train=train, cfg=cfg)
        return integrate(cfg, func, params["func"], fstate, x, train=train,
                         t1=t1, observer=observer, max_steps=max_steps)

    return ODEBlock(init=init, forward=forward, func=func)
