"""Parameter initialization helpers.

graphax keeps parameters as plain pytrees (nested dicts) applied by pure
functions — the natural fit for ODE right-hand sides that execute inside
`lax.while_loop`/`lax.scan` and under `custom_vjp` adjoints. Initializers
reproduce the reference's torch semantics where tests pin them (e.g. the
constant-1e-5 attention weight init that makes attention uniform at t=0,
`src/function_transformer_attention.py:153-157`,
`test/test_transformer_attention.py:98-106`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_bias_init(key, fan_in: int, out_dim: int):
    """torch nn.Linear default bias: U(-1/√fan_in, 1/√fan_in)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (out_dim,), minval=-bound, maxval=bound)


def xavier_normal(key, shape, gain: float = 1.0):
    """torch nn.init.xavier_normal_: N(0, gain²·2/(fan_in+fan_out)).

    For >2-D shapes torch computes fans from dims 0/1 and receptive field of
    the rest (used by the GAT `a` vector, `src/function_GAT_attention.py:105`).
    """
    if len(shape) >= 2:
        rf = 1
        for s in shape[2:]:
            rf *= s
        fan_in, fan_out = shape[1] * rf, shape[0] * rf
    else:
        fan_in = fan_out = shape[0]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape)


def constant_init(_key, shape, value: float):
    return jnp.full(shape, value)


def linear_init(key, in_dim: int, out_dim: int, weight_init: str = "torch",
                weight_const: float | None = None, gain: float = 1.0,
                bias: bool = True):
    """{'w': [in,out], 'b': [out]} linear layer params.

    weight_init: 'torch' (kaiming-uniform, torch Linear default), 'xavier'
    (xavier_normal), 'const' (constant weight_const — the attention-layer
    init), 'zeros'.
    """
    kw, kb = jax.random.split(key)
    if weight_init == "const":
        w = jnp.full((in_dim, out_dim), weight_const)
    elif weight_init == "xavier":
        w = xavier_normal(kw, (out_dim, in_dim), gain).T
    elif weight_init == "zeros":
        w = jnp.zeros((in_dim, out_dim))
    else:  # torch default: kaiming_uniform(a=√5) ⇒ U(±√(6/fan_in)/√(1+5)) = U(±1/√fan_in)
        bound = 1.0 / math.sqrt(in_dim) if in_dim > 0 else 0.0
        w = jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound)
    p = {"w": w}
    if bias:
        p["b"] = torch_bias_init(kb, in_dim, out_dim)
    return p


def linear_apply(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y
