"""Multimodal / image-grid GNN classifier — `GNN_multimodal`
(`src/GNN_multi.py`).

Forward (`:27-49`): dropout → ODE block (with optional cross-modal attention
against a second modality inside the RHS) → relu → dropout → flatten all node
features → one linear layer to class logits. Used for MNIST/CIFAR pixel-grid
diffusion and CLEVR VQA (`src/run_multi.py`).

Batching: the reference bakes a batch dim into every tensor; here a single
graph forward is defined and `jax.vmap` maps it over the batch (same graph
topology shared across the batch — pixel grids/chains are identical per
sample, `src/data_multi.py:113-197`).

Also provides `forward_plot_path` — the stitched repeated solves the
reference uses for diffusion animations (`:51-100`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from graphax.blocks import get_block
from graphax.models.layers import dropout
from graphax.utils.params import linear_apply, linear_init


class MultimodalGNN(NamedTuple):
    init: Any
    apply: Any          # (params, graph, x, *, train, rng, x2) -> (logits, aux)
    apply_batched: Any  # vmapped over leading batch axis of x (and x2)
    forward_plot_path: Any
    forward_plot_t: Any
    block: Any


def make_multimodal_gnn(cfg, num_nodes: int, num_features: int,
                        num_classes: int) -> MultimodalGNN:
    """``num_nodes`` is static (grid/chain graphs have fixed size) because the
    decoder flattens all node embeddings (`:46-48`)."""
    block = get_block(cfg, num_features)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {
            "block": block.init(k1),
            # m2: flatten(N·D) → classes (`:24-25`)
            "m2": linear_init(k2, num_nodes * num_features, num_classes),
        }

    def apply(params, graph, x, *, train: bool = False, rng=None, x2=None):
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        x = dropout(r1, x, cfg.input_dropout, train)
        out = block.forward(params["block"], graph, x, train=train, y=x2)
        z = jax.nn.relu(out.z)
        z = dropout(r2, z, cfg.dropout, train)
        logits = linear_apply(params["m2"], z.reshape(-1))
        aux = {"nfe": out.result.nfe, "reg_states": out.reg_states,
               "success": out.result.success}
        return logits, aux

    def apply_batched(params, graph, xs, *, train: bool = False, rng=None,
                      x2s=None, graphs=None):
        """Batch forward. ``graph`` is one topology shared by every sample
        (pixel grids); pass ``graphs`` — a Graph whose array leaves carry a
        leading batch axis (e.g. `graphax.data.multimodal
        .batched_chain_graphs`) — for PER-SAMPLE graphs, the reference's
        `[B, 2, E]` batched edge lists (`src/GNN_multi.py:27-49`
        `new_graph`, `src/data_multi.py:376`)."""
        b = xs.shape[0]
        rngs = (jax.random.split(rng, b) if rng is not None
                else jnp.zeros((b, 2), jnp.uint32))

        def one(g, x, r, x2):
            return apply(params, g, x, train=train,
                         rng=r if rng is not None else None, x2=x2)

        if graphs is not None:
            if x2s is None:
                return jax.vmap(lambda g, x, r: one(g, x, r, None))(
                    graphs, xs, rngs)
            return jax.vmap(one)(graphs, xs, rngs, x2s)
        if x2s is None:
            logits, aux = jax.vmap(
                lambda x, r: one(graph, x, r, None))(xs, rngs)
        else:
            logits, aux = jax.vmap(
                lambda x, r, x2: one(graph, x, r, x2))(xs, rngs, x2s)
        return logits, aux

    def forward_plot_path(params, graph, x, frames: int, *, x2=None):
        """States after each of `frames` successive [0, T] solves
        (`forward_plot_path`, `:51-100`) — for diffusion animations."""
        def step(z, _):
            out = block.forward(params["block"], graph, z, train=False, y=x2)
            return out.z, out.z

        _, path = jax.lax.scan(step, x, None, length=frames)
        return jnp.concatenate([x[None], path], axis=0)

    def forward_plot_t(params, graph, x, frames: int, *, x2=None):
        """States at `frames` evenly-spaced intermediate times of ONE
        [0, T] trajectory (`forward_plot_T`, `:51-72`): solved piecewise so
        frame k is x(k·T/frames)."""
        seg = cfg.time / frames

        def step(z, _):
            out = block.forward(params["block"], graph, z, train=False,
                                y=x2, t1=seg)
            return out.z, out.z

        _, path = jax.lax.scan(step, x, None, length=frames)
        return jnp.concatenate([x[None], path], axis=0)

    return MultimodalGNN(init=init, apply=apply, apply_batched=apply_batched,
                         forward_plot_path=forward_plot_path,
                         forward_plot_t=forward_plot_t, block=block)
