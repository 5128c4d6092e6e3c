"""Shared diffusion-RHS machinery.

The reference's `ODEFunc` base (`src/base_classes.py:116-134`) holds learnable
`alpha_train`/`beta_train` scalars plus mutable per-forward state
(`edge_index`, `edge_weight`, `attention_weights`, `x0`, `y`). Here the
learnables live in the params pytree and the per-forward state is an explicit
frozen :class:`FuncState` threaded through the solver."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from graphax.sparse.graph import Graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FuncState:
    """Per-forward immutable context for a diffusion RHS.

    Attributes:
      graph: normalized topology + edge weights.
      x0: the encoder output at t=0 (source term when ``add_source``).
      attention: optional ``[E]`` per-edge values that *replace*
        ``graph.edge_weight`` in the linear (laplacian) RHS — set by the
        attention / mixed / hard-attention blocks. (The reference stores
        per-head ``[E, H]`` for block='attention' and means over heads on
        every NFE, `src/function_laplacian_diffusion.py:44-48`; meaning is
        identical, we mean once at pin time.)
      y: second-modality node features ``[M, D2]`` for cross-modal attention.
    """

    graph: Graph
    x0: Optional[jax.Array] = None
    attention: Optional[jax.Array] = None
    y: Optional[jax.Array] = None
    # densified [N, N] operator (dense strategy; built once per forward by
    # the block so every NFE is a plain matmul)
    dense_adj: Optional[jax.Array] = None
    # edge values pre-blocked into the row-tiled / transpose layouts for the
    # Pallas SpMM path (built once per forward; see kernels.pallas_tiled)
    wb: Optional[jax.Array] = None
    wb_t: Optional[jax.Array] = None
    # eval-only fast path: route the per-NFE transformer attention RHS to the
    # streaming Pallas kernels (kernels.pallas_attention). Off for training
    # forwards — its custom_vjp backward replays the XLA path, which would
    # make train steps strictly slower.
    fast_attention: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    def edge_values(self) -> jax.Array:
        return self.graph.edge_weight if self.attention is None else self.attention


class DiffusionFunction(NamedTuple):
    """A diffusion RHS family: pure init/apply pair (+ optional attention)."""

    init: Callable[[jax.Array], Any]                       # key -> params
    rhs: Callable[[Any, FuncState, Any, jax.Array], jax.Array]
    # (params, fstate, x, y) -> (attention [E, H], aux); None for laplacian
    attention_fn: Optional[Callable] = None


def init_alpha_beta(cfg) -> dict:
    """`alpha_train`/`beta_train` init 0.0 (`src/base_classes.py:125-126`).
    The reference also defines dead `alpha_sc`/`beta_sc`/`w`/`d` params that
    no forward path reads (SURVEY §2.1) — intentionally not replicated."""
    return {"alpha_train": jnp.zeros(()), "beta_train": jnp.zeros(())}


def prepare_scalars(params, cfg, dtype):
    """Precompute activation scalars ONCE per forward, outside the solver
    loop. A scalar `sigmoid` inside the integrator body measurably breaks
    XLA loop-invariant hoisting on TPU (~1.2 ms/step pipeline stall at arxiv
    scale); hoisting it here makes every RHS evaluation scalar-op-free.
    Gradients still flow to alpha_train/beta_train through this step."""
    alpha = params["alpha_train"]
    if not cfg.no_alpha_sigmoid:
        alpha = jax.nn.sigmoid(alpha)
    out = dict(params)
    out["_alpha_eff"] = alpha.astype(dtype)
    out["_beta_eff"] = params["beta_train"].astype(dtype)
    att = params.get("att")
    if isinstance(att, dict) and "output_var" in att:
        # hoist the exp_kernel scalar algebra out of the solver loop too
        att = dict(att)
        att["_ov2"] = (att["output_var"] ** 2).astype(jnp.float32)
        att["_inv2l2"] = (1.0 / (2.0 * att["lengthscale"] ** 2)) \
            .astype(jnp.float32)
        out["att"] = att
    return out


def apply_alpha_beta(params, cfg, ax, x, x0):
    """``f = α·(ax − x) [+ β·x0]`` with α = sigmoid(alpha_train) unless
    `no_alpha_sigmoid` (`src/function_laplacian_diffusion.py:69-77`).
    Scalars are cast to the state dtype so mixed-precision states never get
    silently promoted to f32."""
    if "_alpha_eff" in params:
        alpha = params["_alpha_eff"].astype(x.dtype)
        beta = params["_beta_eff"].astype(x.dtype)
    else:
        alpha = params["alpha_train"]
        if not cfg.no_alpha_sigmoid:
            alpha = jax.nn.sigmoid(alpha)
        alpha = alpha.astype(x.dtype)
        beta = params["beta_train"].astype(x.dtype)
    f = alpha * (ax.astype(x.dtype) - x)
    if cfg.add_source:
        f = f + beta * x0.astype(x.dtype)
    return f


def cross_modal_init(key, in_dim: int, second_dim: int) -> dict:
    """Q2/K2/V2 projections for the fork's multimodal cross-attention
    (`src/function_laplacian_diffusion.py:29-37`)."""
    from graphax.utils.params import linear_init

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "Q2": linear_init(k1, in_dim, in_dim, "const", 1e-5),
        "K2": linear_init(k2, second_dim, in_dim, "const", 1e-5),
        "V2": linear_init(k3, second_dim, in_dim, "const", 1e-5),
    }


def cross_modal_apply(params, x, y):
    """x ← softmax(Q2(x)·K2(y)ᵀ/√d)·V2(y) — dense attention of graph nodes
    over second-modality tokens. The reference writes `torch.nn.softmax`
    (nonexistent API, a latent crash — SURVEY §8); the intent
    (`src/function_transformer_attention.py:220-222`) is implemented."""
    from graphax.utils.params import linear_apply

    q = linear_apply(params["Q2"], x)            # [N, D]
    k = linear_apply(params["K2"], y)            # [M, D]
    v = linear_apply(params["V2"], y)            # [M, D]
    d = q.shape[-1]
    scores = (q @ k.T) / jnp.sqrt(jnp.asarray(d, q.dtype))
    return jax.nn.softmax(scores, axis=-1) @ v
