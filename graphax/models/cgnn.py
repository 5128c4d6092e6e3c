"""Continuous GNN (ICML'20) baseline — `CGNN` (`src/CGNN.py:73-171`).

RHS: ``f = σ(α)·½(A x − x) + x0`` with a *per-node* learnable α (init
cfg.alpha) and a fixed symmetric-normalized adjacency; state always ANODE-
augmented (hidden doubled with zeros); encoder m1 → solve → truncate → relu →
dropout → m2. Solved with the default dopri5 (the reference calls torchdiffeq
`odeint` with default tolerances, `:111`)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from graphax.models.layers import dropout
from graphax.ode import odeint
from graphax.sparse.graph import Graph
from graphax.sparse.ops import gcn_norm_weights, spmm
from graphax.utils.params import linear_apply, linear_init


class CGNNModel(NamedTuple):
    init: Any
    apply: Any
    rhs: Any
    init_for_graph: Any


def make_cgnn(cfg, num_features: int, num_classes: int) -> CGNNModel:
    hidden = cfg.hidden_dim

    def init(key):
        k1, k2 = jax.random.split(key)
        return {
            "m1": linear_init(k1, num_features, hidden),
            "m2": linear_init(k2, hidden, num_classes),
            "alpha_train": jnp.full((0,), 0.0),  # resized lazily per graph
        }

    def init_for_graph(key, graph: Graph):
        p = init(key)
        p["alpha_train"] = jnp.full((graph.num_nodes,), float(cfg.alpha))
        return p

    def rhs(params, graph: Graph, x0, t, x):
        alph = jax.nn.sigmoid(params["alpha_train"])[:, None]
        ax = spmm(graph.row, graph.col, graph.edge_weight, x, graph.num_nodes)
        return alph * 0.5 * (ax - x) + x0

    def apply(params, graph: Graph, x, *, train: bool = False, rng=None):
        """``graph`` must carry gcn-normalized weights (see
        `normalize_for_cgnn`)."""
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        x = dropout(r1, x, cfg.input_dropout, train)
        x = linear_apply(params["m1"], x)
        x = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)  # always augment
        x0 = jax.lax.stop_gradient(x)
        res = odeint(lambda t, y: rhs(params, graph, x0, t, y), x, 0.0,
                     float(cfg.time), method=cfg.method, rtol=cfg.rtol,
                     atol=cfg.atol, step_size=cfg.step_size,
                     max_nfe=cfg.max_nfe, differentiable=train)
        z = res.y[..., :hidden]
        z = jax.nn.relu(z)
        z = dropout(r2, z, cfg.dropout, train)
        logits = linear_apply(params["m2"], z)
        return logits, {"nfe": res.nfe, "success": res.success}

    return CGNNModel(init=init, apply=apply, rhs=rhs,
                     init_for_graph=init_for_graph)


def normalize_for_cgnn(graph: Graph) -> Graph:
    """Symmetric normalization `get_sym_adj` (`src/utils.py:208-212`) — the
    adjacency the CGNN RHS consumes."""
    w = gcn_norm_weights(graph.row, graph.col, graph.edge_weight,
                         graph.num_nodes, mask=graph.edge_mask)
    return graph.with_weights(w)
