"""Reusable multi-chip GRAND training step.

Composes the pieces (partitioner → halo-exchange RHS → solver → psum'd loss
and gradients) into one factory, so multi-chip training is an API call
rather than a hand-assembled shard_map (the pattern `__graft_entry__.
dryrun_multichip` demonstrates). Supports the laplacian (GRAND-l) and
transformer-attention (GRAND-nl) RHS with fixed-step solvers inside the
sharded step; params replicated, nodes sharded over 'graph', optional batch
axis over 'data'.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphax.dist.partition import EdgePartition, partition_graph, \
    shard_nodes, unshard_nodes
from graphax.dist.sharded import halo_exchange


def make_sharded_grand_trainer(mesh: Mesh, part: EdgePartition, cfg,
                               num_features: int, num_classes: int,
                               optimizer: Optional[
                                   optax.GradientTransformation] = None,
                               axis_name: str = "graph"):
    """Returns (init_params, train_step, eval_logits) for a sharded
    encoder → diffusion solve → decoder classifier.

    - state sharded ``[P, Nb, ·]`` over ``axis_name``; params replicated;
    - per-NFE communication = one halo all_to_all of the node state;
    - fixed-step solve (cfg.method euler/rk4 semantics via per-step scan —
      the fixed grid of `graphax.ode` inlined so the collective lives
      inside the scan body);
    - loss = psum'd masked CE; gradients pmean'd over all mesh axes.
    """
    tx = optimizer or optax.adam(cfg.lr)
    nb = part.block_size
    hidden = cfg.hidden_dim
    use_attention = cfg.function in ("transformer", "GAT")
    heads = cfg.heads
    d_k = cfg.attention_dim // heads if use_attention else 0
    n_steps = max(int(round(cfg.time / cfg.step_size)), 1)
    dt = cfg.time / n_steps

    tables = (jnp.asarray(part.local_row), jnp.asarray(part.local_col),
              jnp.asarray(part.edge_weight * part.edge_mask),
              jnp.asarray(part.edge_mask), jnp.asarray(part.send_idx),
              jnp.asarray(part.halo_gather))
    gspec = P(axis_name)

    def init_params(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        p = {
            "m1": {"w": jax.random.normal(k1, (num_features, hidden))
                   * (1.0 / np.sqrt(num_features)),
                   "b": jnp.zeros(hidden)},
            "m2": {"w": jax.random.normal(k2, (hidden, num_classes))
                   * (1.0 / np.sqrt(hidden)),
                   "b": jnp.zeros(num_classes)},
            "alpha_train": jnp.zeros(()),
            "beta_train": jnp.zeros(()),
        }
        if use_attention:
            p["Q"] = {"w": jnp.full((hidden, cfg.attention_dim), 1e-5),
                      "b": jax.random.uniform(
                          k3, (cfg.attention_dim,),
                          minval=-1 / np.sqrt(hidden),
                          maxval=1 / np.sqrt(hidden))}
            p["K"] = {"w": jnp.full((hidden, cfg.attention_dim), 1e-5),
                      "b": jax.random.uniform(
                          k4, (cfg.attention_dim,),
                          minval=-1 / np.sqrt(hidden),
                          maxval=1 / np.sqrt(hidden))}
        return p

    def local_rhs(p, tbl, z, z0, alpha, beta):
        local_row, local_col, weight, edge_mask, send_idx, halo_gather = tbl
        halo = halo_exchange(z, send_idx, halo_gather, part.num_shards,
                             part.pair_size, axis_name)
        z_ext = jnp.concatenate([z, halo], axis=0)
        if use_attention:
            q = (z @ p["Q"]["w"] + p["Q"]["b"]).reshape(nb, heads, d_k)
            k = (z_ext @ p["K"]["w"] + p["K"]["b"]).reshape(-1, heads, d_k)
            s = jnp.einsum("ehd,ehd->eh", q[local_row],
                           k[local_col] / np.sqrt(d_k))
            s = jnp.where(edge_mask[:, None], s, -1e30)
            smax = jax.ops.segment_max(s, local_row, num_segments=nb)
            smax = jnp.where(smax <= -5e29, 0.0, smax)
            e = jnp.where(edge_mask[:, None],
                          jnp.exp(s - smax[local_row]), 0.0)
            denom = jax.ops.segment_sum(e, local_row, num_segments=nb)
            vals = (e / (denom[local_row] + 1e-16)).mean(axis=1)
        else:
            vals = weight
        gathered = z_ext[local_col] * vals[:, None]
        az = jax.ops.segment_sum(gathered, local_row, num_segments=nb)
        f = alpha * (az - z)
        if cfg.add_source:
            f = f + beta * z0
        return f

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), gspec, gspec, gspec, (gspec,) * 6),
        out_specs=(P(), P(), P()))
    def train_step_sm(params, opt_state, xs, ys, masks, tbl):
        tbl_local = tuple(t[0] for t in tbl)
        x = xs[0]
        y = ys[0]
        m = masks[0]

        def loss_fn(p):
            z = x @ p["m1"]["w"] + p["m1"]["b"]
            z0 = jax.lax.stop_gradient(z)
            alpha = jax.nn.sigmoid(p["alpha_train"])
            beta = p["beta_train"]

            def step(c, _):
                return c + dt * local_rhs(p, tbl_local, c, z0, alpha,
                                          beta), None

            z, _ = jax.lax.scan(step, z, None, length=n_steps)
            logits = jax.nn.relu(z) @ p["m2"]["w"] + p["m2"]["b"]
            logp = jax.nn.log_softmax(logits)
            per = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            total = jax.lax.psum(jnp.sum(jnp.where(m, per, 0.0)), axis_name)
            count = jax.lax.psum(jnp.sum(m), axis_name)
            return total / jnp.maximum(count, 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), gspec, (gspec,) * 6), out_specs=gspec)
    def eval_logits_sm(params, xs, tbl):
        tbl_local = tuple(t[0] for t in tbl)
        x = xs[0]
        p = params
        z = x @ p["m1"]["w"] + p["m1"]["b"]
        z0 = z
        alpha = jax.nn.sigmoid(p["alpha_train"])

        def step(c, _):
            return c + dt * local_rhs(p, tbl_local, c, z0, alpha,
                                      p["beta_train"]), None

        z, _ = jax.lax.scan(step, z, None, length=n_steps)
        return (jax.nn.relu(z) @ p["m2"]["w"] + p["m2"]["b"])[None]

    def train_step(params, opt_state, xs, ys, masks):
        return train_step_sm(params, opt_state, xs, ys, masks, tables)

    def eval_logits(params, xs):
        return eval_logits_sm(params, xs, tables)

    return init_params, jax.jit(train_step), jax.jit(eval_logits)
