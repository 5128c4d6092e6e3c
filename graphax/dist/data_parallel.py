"""Replicated-model data parallelism with psum gradient reduction.

Replaces the reference's `nn.DataParallel` usage (`src/ray_tune.py:58-59`,
`src/CGNN.py:341-342`) with a shard_map train step: params replicated, the
batch split over the mesh's 'data' axis, gradients psum-reduced — the
multimodal batched-graphs workload (`src/run_multi.py`)."""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_dp_train_step(mesh: Mesh, loss_fn, optimizer,
                       axis_name: str = "data"):
    """``loss_fn(params, batch_slice, rng) -> scalar`` (mean over the local
    slice). Returns ``step(params, opt_state, batch, rng) -> (params,
    opt_state, loss)`` with batch sharded over ``axis_name`` on axis 0 of
    every leaf and params/opt_state replicated."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs=(P(), P(), P()))
    def step(params, opt_state, batch, rng):
        my = jax.lax.axis_index(axis_name)
        local_rng = jax.random.fold_in(rng, my)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, local_rng)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def psum_metric(value, axis_name: str = "graph"):
    """Cross-shard metric reduction — lets the early-stop observer compute
    global accuracy from node-sharded logits (SURVEY §2.8 'distributed
    early-stop/metrics')."""
    return jax.lax.psum(value, axis_name)
