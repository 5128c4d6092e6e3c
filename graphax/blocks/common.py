"""Shared block machinery: per-forward graph normalization and the
solver-invocation harness (regularizer threading, adjoint switch, observer).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from graphax.functions.common import DiffusionFunction, FuncState
from graphax.functions.regularizers import (
    init_reg_states, make_regularized_rhs,
)
from graphax.ode import ODEResult, Observer, odeint, odeint_adjoint
from graphax.sparse.graph import Graph
from graphax.sparse.ops import gcn_norm_weights, rw_norm_weights


class BlockOutput(NamedTuple):
    z: jax.Array
    reg_states: Tuple[jax.Array, ...]
    result: ODEResult


def normalize_graph(cfg, graph: Graph, double_self_loops: bool = True) -> Graph:
    """Per-forward weight normalization — twin of `reset_graph_data`
    (`src/base_classes.py:70-90`).

    Requires the graph topology to already contain self-loop edges with
    weight `cfg.self_loop_weight` (added host-side by `build.build_graph`).
    The fork then adds `self_loop_weight` to the diagonal AGAIN after
    normalizing (`:84-86` calls `add_remaining_self_loops` post-norm) — that
    is the runnable behavior, reproduced here when ``double_self_loops``;
    pass False for the textbook normalized operator.

    ``graph.pre_normalized`` short-circuits: the Trainer hoists this to
    init/rewire time (weights are static between topology changes).
    """
    if getattr(graph, "pre_normalized", False):
        return graph
    mask = graph.edge_mask
    if cfg.data_norm == "rw":
        w = rw_norm_weights(graph.row, graph.col, graph.edge_weight,
                            graph.num_nodes, norm_dim=1, mask=mask)
    else:
        w = gcn_norm_weights(graph.row, graph.col, graph.edge_weight,
                             graph.num_nodes, mask=mask)
    if double_self_loops and cfg.self_loop_weight > 0:
        w = w + jnp.where(mask & (graph.row == graph.col),
                          jnp.asarray(cfg.self_loop_weight, w.dtype), 0.0)
    return graph.with_weights(w)


def make_fstate(graph, x, attention=None, y=None,
                train: bool = True, cfg=None) -> FuncState:
    """Assemble the per-forward FuncState; under the dense strategy the
    [N,N] operator is materialized HERE, once per forward, so the solver's
    RHS evaluations are pure matmuls (graphax.kernels.dense_path)."""
    dense_adj = None
    wb = wb_t = None
    if graph.strategy == "dense":
        from graphax.kernels.dense_path import densify

        values = graph.edge_weight if attention is None else attention
        dense_adj = densify(graph, values)
    else:
        from graphax.kernels.pallas_tiled import blocked_values, pallas_tiled_ok
        from graphax.kernels.pallas_windows import (
            densify_windows, pallas_windowed_ok,
        )
        from graphax.kernels.windows import blocked_window_values

        if pallas_windowed_ok(graph, x):
            # hoist the expensive part of the windowed SpMM out of the
            # solve: dense per-tile operator blocks built ONCE here, so
            # every solver evaluation is a pure batched MXU matmul
            values = graph.edge_weight if attention is None else attention
            win, res, res_t = blocked_window_values(values, graph.windows)
            # dense blocks in the state dtype: one rounding here instead of
            # a [T, tile, W] cast at every solver evaluation
            dense_win = densify_windows(win.astype(x.dtype), graph.windows)
            if graph.windows.hub is not None:
                # hub edges leave the gather residual for the dense hub
                # slab (kernels.hubs); attention paths keep the full
                # residual tables and ignore the extra tuple entry
                from graphax.kernels.hubs import (
                    blocked_hub_values, densify_hubs,
                )

                hubv, restv, restv_t = blocked_hub_values(
                    values, graph.windows.hub)
                wb = (dense_win, restv,
                      densify_hubs(hubv.astype(x.dtype), graph.windows.hub))
                wb_t = restv_t
            else:
                wb = (dense_win, res)
                wb_t = res_t
        elif pallas_tiled_ok(graph, x):
            values = graph.edge_weight if attention is None else attention
            if getattr(graph, "hubs", None) is not None:
                # hub layout: densify the hub edges ONCE here; the solver's
                # SpMM becomes one shared-rhs MXU matmul + rest gather
                from graphax.kernels.hubs import (
                    blocked_hub_values, densify_hubs,
                )

                hub, rest, rest_t = blocked_hub_values(values, graph.hubs)
                wb = (densify_hubs(hub.astype(x.dtype), graph.hubs), rest)
                wb_t = rest_t
            else:
                wb = blocked_values(values, graph.tiles)
                wb_t = blocked_values(values, graph.tiles_t)
    # eval forwards always ride the streaming/flash kernels; train forwards
    # do too when the config has a Pallas backward (round 2 —
    # kernels.pallas_attention.pallas_bwd_supported), else they stay on the
    # XLA fused path (a Pallas fwd whose bwd replays XLA would be slower)
    train_ok = False
    if train and cfg is not None:
        from graphax.kernels.pallas_attention import pallas_bwd_supported

        train_ok = (pallas_bwd_supported(cfg)
                    and getattr(graph, "tiles_t", None) is not None
                    and getattr(graph.tiles_t, "perm_from_row", None)
                    is not None)
    fast_att = ((not train or train_ok) and graph.strategy == "tiled"
                and graph.tiles is not None and x.ndim == 2
                and (jax.default_backend() == "tpu"
                     or pallas_tiled_FORCE()))
    return FuncState(graph=graph, x0=jax.lax.stop_gradient(x),
                     attention=attention, y=y, dense_adj=dense_adj,
                     wb=wb, wb_t=wb_t, fast_attention=fast_att)


def pallas_tiled_FORCE() -> bool:
    from graphax.kernels import pallas_tiled

    return pallas_tiled.FORCE


def _split_diff_state(fstate: FuncState):
    """Separate the differentiable leaves of FuncState (x0, attention, edge
    weights, second modality) from the static topology, for the adjoint path
    (integer index arrays must not enter the adjoint state)."""
    diff = {
        "x0": fstate.x0,
        "attention": fstate.attention,
        "edge_weight": fstate.graph.edge_weight,
        "y": fstate.y,
        "dense_adj": fstate.dense_adj,
        "wb": fstate.wb,
        "wb_t": fstate.wb_t,
    }

    def rebuild(d):
        return dataclasses.replace(
            fstate,
            x0=d["x0"], attention=d["attention"], y=d["y"],
            dense_adj=d["dense_adj"], wb=d["wb"], wb_t=d["wb_t"],
            graph=fstate.graph.with_weights(d["edge_weight"]))

    return diff, rebuild


def integrate(cfg, func: DiffusionFunction, params, fstate: FuncState,
              x: jax.Array, *, train: bool, t1: Optional[float] = None,
              observer: Optional[Observer] = None, rhs_override=None,
              max_steps: Optional[int] = None) -> BlockOutput:
    """Run the solve the way the reference blocks invoke torchdiffeq
    (`src/block_constant.py:27-58`): regularizer state threading when
    training with nreg>0, the adjoint integrator when ``cfg.adjoint and
    train``, the plain one otherwise. ``observer`` is only meaningful on the
    non-adjoint path (eval-time early stopping)."""
    t_end = float(cfg.time if t1 is None else t1)
    from graphax.functions.common import prepare_scalars

    x_dtype = jax.tree_util.tree_leaves(x)[0].dtype
    params = prepare_scalars(params, cfg, x_dtype)
    rhs = rhs_override if rhs_override is not None else func.rhs
    reg = cfg.reg_coeffs() if train else ()
    reg_names = tuple(n for n, _ in reg)

    if reg_names:
        aug_rhs = make_regularized_rhs(rhs, reg_names)
        state0: Any = (x, init_reg_states(fstate.graph.num_nodes, reg_names,
                                          x_dtype))
        call = aug_rhs
    else:
        state0 = x
        call = rhs

    common = dict(method=cfg.method, rtol=cfg.rtol, atol=cfg.atol,
                  step_size=cfg.step_size, max_nfe=cfg.max_nfe,
                  max_steps=max_steps)

    if cfg.adjoint and train:
        diff, rebuild = _split_diff_state(fstate)

        def f_adj(p, t, y):
            return call(p["params"], rebuild(p["fstate"]), t, y)

        res = odeint_adjoint(
            f_adj, {"params": params, "fstate": diff}, state0, 0.0, t_end,
            adjoint_method=cfg.adjoint_method,
            adjoint_rtol=cfg.rtol_adjoint, adjoint_atol=cfg.atol_adjoint,
            adjoint_step_size=cfg.adjoint_step_size, **common)
    else:
        res = odeint(lambda t, y: call(params, fstate, t, y), state0, 0.0,
                     t_end, observer=observer, differentiable=train,
                     stage_remat=cfg.stage_remat, **common)

    if reg_names:
        z, reg_states = res.y
    else:
        z, reg_states = res.y, ()
    return BlockOutput(z=z, reg_states=reg_states, result=res)
