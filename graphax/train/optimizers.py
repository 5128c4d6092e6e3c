"""Optimizer factory — twin of `get_optimizer`
(`src/graph_datasets/run_GNN.py:30-37` upstream pattern): sgd / rmsprop /
adagrad / adam / adamax keyed by cfg.optimizer, with torch-style coupled
weight decay (decay added to the gradient before the update, as
`torch.optim.*(weight_decay=...)` does)."""

from __future__ import annotations

import optax


def get_optimizer(name: str, lr: float, weight_decay: float = 0.0
                  ) -> optax.GradientTransformation:
    base = {
        "sgd": lambda: optax.sgd(lr),
        "rmsprop": lambda: optax.rmsprop(lr, decay=0.99, eps=1e-8),
        "adagrad": lambda: optax.adagrad(lr, eps=1e-10),
        "adam": lambda: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
        "adamax": lambda: optax.adamax(lr, b1=0.9, b2=0.999, eps=1e-8),
    }
    if name not in base:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = base[name]()
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
