"""Functional NN layers: dropout and batch-norm with explicit state."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(rng, x, rate: float, train: bool):
    """Inverted dropout matching F.dropout semantics. No-op when not
    training, rate==0, or rng is None."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def batchnorm_init(dim: int):
    params = {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}
    state = {"mean": jnp.zeros(dim), "var": jnp.ones(dim),
             "count": jnp.zeros(())}
    return params, state


def batchnorm_apply(params, state, x, train: bool, momentum: float = 0.1,
                    eps: float = 1e-5):
    """BatchNorm1d over the node axis (torch semantics: batch stats + running
    average update in train, running stats in eval). Returns (y, new_state)."""
    if train:
        mean = x.mean(axis=tuple(range(x.ndim - 1)))
        var = x.var(axis=tuple(range(x.ndim - 1)))
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"], new_state
