"""GNN_KNN: the rewiring-experiment model with the "fully adjacent" final
layer — `GNN_KNN`/`GNNKNNEarly` (`src/GNN_KNN.py`, `src/GNN_KNN_early.py`).

Same encoder→ODE→decoder as `make_gnn`, plus the `fa_layer` path
(`src/GNN_KNN.py:66-84`): after the main solve, a SECOND ODE block runs on a
densified graph with a fixed-step rk4 over [0, 1] (the bottleneck-paper
"last layer is fully adjacent" idea). The densified graph is built at the
host epoch boundary (`graphax.rewiring.add_edges` / full adjacency) and
passed in — keeping the jitted forward static-shape.

Early-stop evaluation composes exactly as for `make_gnn` via
`graphax.models.early.evaluate_early_stop` (the reference's `GNNKNNEarly`
is `GNN_KNN` + the early-stop test integrator)."""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax

from graphax.blocks import get_block
from graphax.models.gnn import GNNModel, make_gnn


class KNNGNNModel(NamedTuple):
    base: GNNModel
    init: Any
    apply: Any
    encode: Any
    forward_ode: Any
    decode: Any
    block: Any
    fa_block: Any
    state_dim: int


def make_gnn_knn(cfg, num_features: int, num_classes: int) -> KNNGNNModel:
    base = make_gnn(cfg, num_features, num_classes)
    # fa layer: rk4, T=1, step 1 (`src/GNN_KNN.py:70-76`)
    cfg_fa = cfg.replace(method="rk4", time=1.0, step_size=1.0,
                         adjoint=False)
    fa_block = get_block(cfg_fa, base.state_dim) if cfg.fa_layer else None

    def init(key):
        if fa_block is None:
            # same key path as make_gnn: a rewiring run without the fa
            # layer has the SAME params as the plain model (checkpoints
            # and the sharded trainer transplant either way)
            return base.init(key)
        k1, k2 = jax.random.split(key)
        params, state = base.init(k1)
        params["fa_block"] = fa_block.init(k2)
        return params, state

    def forward_ode(params, state, graph, x, *, train: bool, rng=None,
                    pos_encoding=None, x2=None, t1=None, observer=None,
                    max_steps=None, fa_graph=None):
        z, state, out = base.forward_ode(
            params, state, graph, x, train=train, rng=rng,
            pos_encoding=pos_encoding, x2=x2, t1=t1, observer=observer,
            max_steps=max_steps)
        if fa_block is not None and fa_graph is not None:
            fa_out = fa_block.forward(params["fa_block"], fa_graph, z,
                                      train=train, y=x2)
            z = fa_out.z
        return z, state, out

    def apply(params, state, graph, x, *, train: bool = False, rng=None,
              pos_encoding=None, x2=None, t1=None, observer=None,
              max_steps=None, fa_graph=None):
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        z, state, out = forward_ode(params, state, graph, x, train=train,
                                    rng=r1, pos_encoding=pos_encoding,
                                    x2=x2, t1=t1, observer=observer,
                                    max_steps=max_steps, fa_graph=fa_graph)
        logits = base.decode(params, z, train=train, rng=r2)
        aux = {"nfe": out.result.nfe, "steps": out.result.steps,
               "success": out.result.success, "reg_states": out.reg_states,
               "observer": out.result.observer}
        return logits, state, aux

    return KNNGNNModel(base=base, init=init, apply=apply, encode=base.encode,
                       forward_ode=forward_ode, decode=base.decode,
                       block=base.block, fa_block=fa_block,
                       state_dim=base.state_dim)
