"""Sharded epoch-boundary graph rewiring (VERDICT r4 item 5).

DistTrainer.rewire_knn must (a) produce the SAME rewired topology and
training trajectory as the single-chip Trainer (`run_GNN.py:252-254`,
`graph_rewiring.py:151-161`), and (b) re-enter the already-compiled jitted
step via the table-swap fast path when the static caps hold (SURVEY §7.3
hard part 5: "re-partition between epochs, keep jit caches warm")."""

import numpy as np
import pytest

import jax

from graphax import Config
from graphax.data.container import GraphData
from graphax.dist import DistTrainer
from graphax.sparse import Graph
from graphax.train import Trainer


def _data(seed=0, n=48):
    from graphax.data import make_sbm_dataset

    return make_sbm_dataset(num_nodes=n, num_classes=3, num_features=6,
                            p_in=0.15, p_out=0.02, feature_noise=2.0,
                            seed=seed)


def _cfg(**kw):
    base = dict(block="constant", function="laplacian", hidden_dim=8,
                method="euler", step_size=0.5, time=1.0,
                input_dropout=0.0, dropout=0.0, lr=0.02, no_early=True,
                rewire_KNN=True, rewire_KNN_epoch=2, rewire_KNN_T="T0",
                rewire_KNN_k=6, self_loop_weight=1.0)
    base.update(kw)
    return Config(**base)


def test_dist_rewire_matches_single_chip_trajectory():
    """4 epochs with a rewire at epochs 2 and 4: the sharded run's losses
    track the single-chip run's (same embeddings -> same kNN edges ->
    same solve)."""
    cfg = _cfg(mesh_shape=(4,))
    out1 = Trainer(cfg, _data()).fit(epochs=4, log_every=0, seed=0)
    trd = DistTrainer(cfg, _data(), partition_method="contiguous")
    out2 = trd.fit(epochs=4, log_every=0, seed=0)
    l1 = [h["loss"] for h in out1["history"]]
    l2 = [h["loss"] for h in out2["history"]]
    np.testing.assert_allclose(l2, l1, rtol=2e-4, atol=2e-5)
    # the topology really changed mid-training
    assert trd.part is not None
    assert len(l1) == 4


def test_dist_rewire_warm_swap_same_caps():
    """Re-rewiring at unchanged caps must swap table VALUES into the
    existing compiled model (no rebuild): same ShardedGNN object, warm
    flag set."""
    cfg = _cfg(mesh_shape=(4,), rewire_KNN_T="raw")
    trd = DistTrainer(cfg, _data(), partition_method="contiguous")
    state = trd.init_state(0)
    trd.rewire_knn(state)          # caps may change -> possibly rebuilt
    model_after_first = trd.model
    state, loss1 = trd.train_step(state)
    trd.rewire_knn(state)          # raw embeddings -> identical topology
    assert trd.last_swap_was_warm
    assert trd.model is model_after_first
    state, loss2 = trd.train_step(state)
    assert np.isfinite(loss2)


def test_dist_rewire_tn_embeddings_run():
    """TN mode (encoder + full solve) drives the sharded embed entry."""
    cfg = _cfg(mesh_shape=(4,), rewire_KNN_T="TN")
    trd = DistTrainer(cfg, _data(), partition_method="contiguous")
    state = trd.init_state(0)
    z = trd._embeddings(state, "TN")
    assert z.shape[0] == trd.data.num_nodes
    assert np.all(np.isfinite(z))
    trd.rewire_knn(state)
    state, loss = trd.train_step(state)
    assert np.isfinite(loss)
