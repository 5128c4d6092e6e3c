"""The GRAND/BLEND node classifier: encoder → ODE block → decoder.

Functional twin of `GNN` (`src/GNN.py:17-74`) / `BaseGNN`
(`src/base_classes.py:137-186`):

encode:  [strip labels] → dropout → m1 (or Beltrami mx‖mp on features and
         positional encodings) → [residual MLP m11/m12] → [re-append labels]
         → [batch-norm] → [ANODE augmentation: append zeros]
solve:   odeblock(x0) over [0, T]
decode:  [truncate augmentation] → relu → [fc → relu] → dropout → m2

The reference mutates `opt['hidden_dim']` to account for Beltrami/labels
(`src/base_classes.py:149-164`); here the ODE state width is computed by
`Config.state_dim` and nothing mutates.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from graphax.blocks import get_block
from graphax.models.layers import batchnorm_apply, batchnorm_init, dropout
from graphax.utils.params import linear_apply, linear_init


class GNNModel(NamedTuple):
    init: Any        # (key) -> (params, state)
    apply: Any       # full forward -> (logits, new_state, aux)
    encode: Any      # forward_encoder
    forward_ode: Any # forward_ODE (encode + solve, no decode)
    decode: Any      # z -> logits (shared by early-stop observer)
    block: Any       # the underlying ODEBlock
    state_dim: int


def make_gnn(cfg, num_features: int, num_classes: int) -> GNNModel:
    state_dim = cfg.state_dim(num_features, num_classes)
    # width before ANODE augmentation — the decoder operates on this
    base_dim = state_dim // 2 if cfg.augment else state_dim
    hidden_wo_labels = (cfg.feat_hidden_dim + cfg.pos_enc_hidden_dim
                        if cfg.beltrami else cfg.hidden_dim)
    block = get_block(cfg, state_dim)

    def init(key):
        keys = jax.random.split(key, 10)
        params: dict = {}
        state: dict = {}
        if cfg.beltrami:
            params["mx"] = linear_init(keys[0], num_features,
                                       cfg.feat_hidden_dim)
            assert cfg.pos_enc_dim > 0, \
                "beltrami requires cfg.pos_enc_dim (positional input width)"
            params["mp"] = linear_init(keys[1], cfg.pos_enc_dim,
                                       cfg.pos_enc_hidden_dim)
        else:
            params["m1"] = linear_init(keys[0], num_features, cfg.hidden_dim)
        if cfg.use_mlp:
            params["m11"] = linear_init(keys[2], hidden_wo_labels,
                                        hidden_wo_labels)
            params["m12"] = linear_init(keys[3], hidden_wo_labels,
                                        hidden_wo_labels)
        if cfg.fc_out:
            params["fc"] = linear_init(keys[4], base_dim, base_dim)
        params["m2"] = linear_init(keys[5], base_dim, num_classes)
        if cfg.batch_norm:
            params["bn_in"], state["bn_in"] = batchnorm_init(base_dim)
            params["bn_out"], state["bn_out"] = batchnorm_init(base_dim)
        params["block"] = block.init(keys[6])
        return params, state

    def encode(params, state, x, *, train: bool, rng=None,
               pos_encoding=None, apply_dropout: bool = True):
        """forward_encoder (`src/GNN_early.py:102-130`). Returns (x0, state)."""
        r = (jax.random.split(rng, 6) if rng is not None
             else [None] * 6)
        labels = None
        if cfg.use_labels:
            labels = x[..., -num_classes:]
            x = x[..., :-num_classes]
        do = (lambda k, z, p: dropout(k, z, p, train)) if apply_dropout \
            else (lambda k, z, p: z)
        if cfg.beltrami:
            x = do(r[0], x, cfg.input_dropout)
            x = linear_apply(params["mx"], x)
            p = do(r[1], pos_encoding, cfg.input_dropout)
            p = linear_apply(params["mp"], p)
            x = jnp.concatenate([x, p], axis=-1)
        else:
            x = do(r[0], x, cfg.input_dropout)
            x = linear_apply(params["m1"], x)
        if cfg.use_mlp:
            x = do(r[2], x, cfg.dropout)
            x = do(r[3], x + linear_apply(params["m11"], jax.nn.relu(x)),
                   cfg.dropout)
            x = do(r[4], x + linear_apply(params["m12"], jax.nn.relu(x)),
                   cfg.dropout)
        if cfg.use_labels:
            x = jnp.concatenate([x, labels], axis=-1)
        if cfg.batch_norm:
            x, bn_state = batchnorm_apply(params["bn_in"], state["bn_in"], x,
                                          train)
            state = {**state, "bn_in": bn_state}
        if cfg.augment:
            x = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
        return x, state

    def forward_ode(params, state, graph, x, *, train: bool, rng=None,
                    pos_encoding=None, x2=None, t1=None, observer=None,
                    max_steps=None):
        """forward_ODE (`src/GNN_early.py:132-147`): encode + solve, no
        decode. Returns (z, state, BlockOutput)."""
        enc_rng, _ = (jax.random.split(rng) if rng is not None
                      else (None, None))
        x0, state = encode(params, state, x, train=train, rng=enc_rng,
                           pos_encoding=pos_encoding)
        # mixed precision: encoder/decoder in f32, the ODE state in
        # cfg.dtype (bf16 halves the solver's HBM traffic — the gather-bound
        # hot loop — and doubles MXU rate; attention scores and SpMM
        # accumulation stay f32 inside the kernels)
        ode_dtype = jnp.dtype(cfg.dtype)
        orig_dtype = x0.dtype
        out = block.forward(params["block"], graph, x0.astype(ode_dtype),
                            train=train, y=x2, t1=t1, observer=observer,
                            max_steps=max_steps)
        if out.z.dtype != orig_dtype:
            out = out._replace(z=out.z.astype(orig_dtype))
        return out.z, state, out

    def decode(params, z, *, train: bool = False, rng=None):
        """relu → [fc → relu] → dropout → m2 (`src/GNN.py:62-74`)."""
        if cfg.augment:
            z = z[..., : z.shape[-1] // 2]
        z = jax.nn.relu(z)
        if cfg.fc_out:
            z = jax.nn.relu(linear_apply(params["fc"], z))
        z = dropout(rng, z, cfg.dropout, train)
        return linear_apply(params["m2"], z)

    def apply(params, state, graph, x, *, train: bool = False, rng=None,
              pos_encoding=None, x2=None, t1=None, observer=None,
              max_steps=None):
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        z, state, out = forward_ode(params, state, graph, x, train=train,
                                    rng=r1, pos_encoding=pos_encoding, x2=x2,
                                    t1=t1, observer=observer,
                                    max_steps=max_steps)
        logits = decode(params, z, train=train, rng=r2)
        aux = {"nfe": out.result.nfe, "steps": out.result.steps,
               "success": out.result.success, "reg_states": out.reg_states,
               "observer": out.result.observer}
        return logits, state, aux

    return GNNModel(init=init, apply=apply, encode=encode,
                    forward_ode=forward_ode, decode=decode, block=block,
                    state_dim=state_dim)
