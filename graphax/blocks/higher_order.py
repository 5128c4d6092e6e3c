"""Higher-order graph PDE block — order-k dynamics.

The reference's experimental `src/higher_order_ode/` (SURVEY §2.1: modified
block copies adding `ode_order` recursion, not importable as-is — spaces in
filenames; capability = "order-k graph PDEs") nests integrals by re-invoking
the block inside its own RHS with cached last-call integrals. The clean
TPU-native equivalent is the standard order reduction: augment the state
with the first k−1 time derivatives,

    d/dt (x, v₁, …, v_{k−1}) = (v₁, …, v_{k−1}, f(x))

so one solver pass integrates the order-k PDE (k=2 is the graph wave
equation — oscillatory instead of purely dissipative diffusion). Works with
every diffusion RHS, solver, and strategy."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphax.blocks.common import BlockOutput, integrate, make_fstate, \
    normalize_graph
from graphax.blocks.constant import ODEBlock
from graphax.functions import get_function


def make_higher_order_block(cfg, in_dim: int, order: int = 2) -> ODEBlock:
    assert order >= 1
    func = get_function(cfg, in_dim)

    def init(key):
        return {"func": func.init(key)}

    def forward(params, graph, x, *, train: bool, y=None, t1=None,
                observer=None, max_steps=None) -> BlockOutput:
        g = normalize_graph(cfg, graph)
        fstate = make_fstate(g, x, y=y, train=train, cfg=cfg)

        def aug_rhs(p, fs, t, state):
            x0, *vs = state
            dx_last = func.rhs(p, fs, t, x0)
            # d/dt x = v1, ..., d/dt v_{k-2} = v_{k-1}, d/dt v_{k-1} = f(x)
            return tuple(vs) + (dx_last,)

        state0 = (x,) + tuple(jnp.zeros_like(x) for _ in range(order - 1))
        if order == 1:
            return integrate(cfg, func, params["func"], fstate, x,
                             train=train, t1=t1, observer=observer,
                             max_steps=max_steps)
        out = integrate(cfg, func, params["func"], fstate, state0,
                        train=train, t1=t1, observer=observer,
                        max_steps=max_steps, rhs_override=aug_rhs)
        z = out.z[0] if isinstance(out.z, tuple) else out.z
        return BlockOutput(z=z, reg_states=out.reg_states, result=out.result)

    return ODEBlock(init=init, forward=forward, func=func)
