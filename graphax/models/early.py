"""Early-stop evaluation: observe accuracy mid-trajectory during the test
solve and keep the best-validation snapshot.

The reference implements this by subclassing torchdiffeq's RK solvers
(`EarlyStopDopri5` / `EarlyStopRK4`, `src/early_stop_solver.py`): after each
accepted adaptive step it truncates any ANODE augmentation, applies
relu → decoder (a detached copy of m2), computes train/val/test accuracy
against held data, tracks the best val acc (+ the step's t1 and its test
acc), integrates to ``earlystopxT·T`` capped at ``max_test_steps``
(`:71-128,253`).

Here the same capability is a solver :class:`~graphax.ode.Observer` — no
solver subclassing, works with every adaptive/fixed method (the reference
supports only dopri5/rk4, `:237-240`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from graphax.ode import Observer
from graphax.utils.params import linear_apply


def masked_accuracy(logits, labels, mask):
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.where(mask, (pred == labels), False)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)


def make_accuracy_observer(cfg, m2_params, labels, train_mask, val_mask,
                           test_mask, base_dim: int) -> Observer:
    """Observer carrying (best_train, best_val, best_test, best_time).

    ``m2_params`` is the decoder — detached, as the reference copies
    `m2.weight.data.detach()` into the solver (`src/GNN_early.py:28-30`).
    """
    m2 = jax.lax.stop_gradient(m2_params)

    def update(carry, t, z):
        if cfg.augment:
            z = z[..., :base_dim]
        logits = linear_apply(m2, jax.nn.relu(z))
        tr = masked_accuracy(logits, labels, train_mask)
        va = masked_accuracy(logits, labels, val_mask)
        te = masked_accuracy(logits, labels, test_mask)
        better = va > carry["best_val"]
        return {
            "best_train": jnp.where(better, tr, carry["best_train"]),
            "best_val": jnp.where(better, va, carry["best_val"]),
            "best_test": jnp.where(better, te, carry["best_test"]),
            "best_time": jnp.where(better, t, carry["best_time"]),
        }

    zero = jnp.zeros(())
    init = {"best_train": zero, "best_val": zero, "best_test": zero,
            "best_time": zero}
    return Observer(init=init, update=update)


class EarlyStopResult(NamedTuple):
    logits: jax.Array      # logits at the terminal time earlystopxT·T
    best_train: jax.Array
    best_val: jax.Array
    best_test: jax.Array
    best_time: jax.Array
    nfe: jax.Array


def best_accuracy_from_observer(obs_carry) -> dict:
    return {k: obs_carry[k] for k in
            ("best_train", "best_val", "best_test", "best_time")}


def evaluate_early_stop(cfg, model, params, state, graph, x, labels,
                        train_mask, val_mask, test_mask, *,
                        pos_encoding=None, x2=None) -> EarlyStopResult:
    """The `GNNEarly` eval forward: integrate to ``earlystopxT·T`` with the
    accuracy observer, capping the step budget at ``max_test_steps``
    (`src/early_stop_solver.py:78,253`)."""
    base_dim = model.state_dim // 2 if cfg.augment else model.state_dim
    observer = make_accuracy_observer(cfg, params["m2"], labels, train_mask,
                                      val_mask, test_mask, base_dim)
    logits, _, aux = model.apply(params, state, graph, x, train=False,
                                 pos_encoding=pos_encoding, x2=x2,
                                 t1=cfg.earlystopxT * cfg.time,
                                 observer=observer,
                                 max_steps=cfg.max_test_steps)
    best = aux["observer"]
    return EarlyStopResult(
        logits=logits, best_train=best["best_train"],
        best_val=best["best_val"], best_test=best["best_test"],
        best_time=best["best_time"], nfe=aux["nfe"])
