"""GRAND-l: linear graph diffusion RHS.

``f = α·(A x − x) [+ β·x0]`` where A is the normalized adjacency with
per-edge values that are either the graph's rw/gcn weights or attention
pinned by the enclosing block (`src/function_laplacian_diffusion.py:39-77`).
The reference densifies A to ``[B, N, N]`` per evaluation; here it is one
gather + segment-sum SpMM (Pallas fused kernel on TPU via graphax.kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphax.functions.common import (
    DiffusionFunction, FuncState, apply_alpha_beta, cross_modal_init,
    cross_modal_apply, init_alpha_beta,
)
from graphax.kernels.dispatch import spmm_auto


def make_laplacian(cfg, in_dim: int) -> DiffusionFunction:
    def init(key):
        params = init_alpha_beta(cfg)
        if cfg.multi_modal:
            params["cross"] = cross_modal_init(key, in_dim,
                                               cfg.second_modality_dim)
        return params

    def rhs(params, fstate: FuncState, t, x):
        if cfg.multi_modal and fstate.y is not None:
            x = cross_modal_apply(params["cross"], x, fstate.y)
        g = fstate.graph
        if fstate.dense_adj is not None:
            # dense strategy: one [N,N]x[N,D] MXU matmul per evaluation
            ax = jnp.matmul(fstate.dense_adj.astype(x.dtype), x,
                            preferred_element_type=jnp.float32) \
                .astype(x.dtype)
        elif fstate.wb is not None and g.strategy == "windowed":
            # windowed path: batched matmul against precomputed dense
            # per-tile blocks + gather residual (kernels.pallas_windows)
            from graphax.kernels.pallas_windows import spmm_windowed

            dense_hub = fstate.wb[2] if len(fstate.wb) > 2 else None
            ax = spmm_windowed(fstate.wb[0], fstate.wb[1], fstate.wb_t,
                               x, g.windows, dense_hub=dense_hub)
        elif fstate.wb is not None and getattr(g, "hubs", None) is not None:
            # hub layout: dense top-in-degree operator blocks against the
            # x[hub_ids] slab + gather SpMM on the rest (kernels.hubs)
            from graphax.kernels.hubs import spmm_hub_tiled

            ax = spmm_hub_tiled(fstate.wb[0], fstate.wb[1], fstate.wb_t,
                                x, g.hubs)
        elif fstate.wb is not None:
            # Pallas tiled path: fused gather-scale-reduce kernel with a
            # custom vjp (transpose-SpMM + SDDMM kernels)
            from graphax.kernels.pallas_tiled import spmm_pallas

            ax = spmm_pallas(fstate.wb, fstate.wb_t, x, g.tiles, g.tiles_t)
        else:
            ax = spmm_auto(g, fstate.edge_values(), x)
        return apply_alpha_beta(params, cfg, ax, x, fstate.x0)

    return DiffusionFunction(init=init, rhs=rhs, attention_fn=None)
