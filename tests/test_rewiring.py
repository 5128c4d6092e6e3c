"""Rewiring-layer tests: kNN correctness vs brute force, edge sampling
retention, add-edges dedup, Beltrami encodings (GDC + DeepWalk) with pickle
caching, Poincaré distances, GDC rewiring, dirichlet energy, fa-layer model,
and the Trainer rewiring hook end-to-end."""

import os
import pickle
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax import Config
from graphax.data import make_sbm_dataset
from graphax.models import make_gnn, make_gnn_knn
from graphax.rewiring import (
    add_edges, apply_beltrami, apply_gdc_rewiring, apply_knn,
    apply_pos_dist_rewire, apply_two_hop_rewiring, dirichlet_energy,
    deepwalk_embeddings, edge_sampling, knn_graph, make_symmetric,
    poincare_distances, rewire_graph_with_edges,
)
from graphax.train import Trainer


def test_knn_graph_matches_bruteforce():
    rng = np.random.RandomState(0)
    x = rng.randn(60, 5).astype(np.float32)
    row, col = knn_graph(x, k=4)
    assert row.shape == (240,)
    d = ((x[:, None] - x[None]) ** 2).sum(-1)
    for i in range(60):
        mine = set(col[row == i].tolist())
        want = set(np.argsort(d[i])[:4].tolist())
        # ties can reorder; require ≥3/4 overlap and all within the 4th dist
        kth = np.sort(d[i])[3]
        assert all(d[i, j] <= kth + 1e-5 for j in mine)


def test_knn_zero_rows_isolated():
    x = np.random.RandomState(1).randn(30, 4).astype(np.float32)
    x[5] = 0.0  # zero row → pushed to infinity, neighbors nothing real
    row, col = knn_graph(x, k=3)
    # node 5's neighbors should not include real close nodes' semantics —
    # but more importantly no other node picks 5
    others = col[row != 5]
    assert 5 not in set(others.tolist())


def test_knn_symmetrized():
    x = np.random.RandomState(2).randn(40, 3).astype(np.float32)
    row, col = knn_graph(x, k=3, sym=True)
    d = np.zeros((40, 40))
    np.add.at(d, (row, col), 1)
    np.testing.assert_array_equal(d > 0, (d > 0).T)


def test_rewire_keeps_capacity_when_fits():
    data = make_sbm_dataset(num_nodes=100, seed=0)
    g = data.graph
    r, c = np.asarray(g.row)[:50], np.asarray(g.col)[:50]
    g2 = rewire_graph_with_edges(g, r, c, self_loop_weight=1.0)
    assert g2.edge_buffer_size == g.edge_buffer_size
    assert g2.strategy == g.strategy


def test_add_edges_random_dedup():
    data = make_sbm_dataset(num_nodes=80, seed=1)
    cfg = Config(edge_sampling_add=0.5, edge_sampling_add_type="random")
    rng = np.random.RandomState(3)
    r, c = add_edges(rng, data.graph, cfg)
    key = set(zip(r.tolist(), c.tolist()))
    assert len(key) == len(r)  # dedup
    assert len(r) >= int(data.graph.num_edges)  # grew (or equal)


def test_two_hop_and_gdc_rewiring():
    data = make_sbm_dataset(num_nodes=60, seed=2)
    d2 = apply_two_hop_rewiring(data)
    assert int(d2.graph.num_edges) >= int(data.graph.num_edges)
    cfg = Config(gdc_method="ppr", gdc_sparsification="topk", gdc_k=8,
                 ppr_alpha=0.05)
    d3 = apply_gdc_rewiring(data, cfg)
    # topk per column: each column keeps ≤ 8 entries
    dense = np.asarray(d3.graph.to_dense())
    assert ((dense > 0).sum(axis=0) <= 8).all()


def test_make_symmetric_and_dirichlet():
    data = make_sbm_dataset(num_nodes=50, seed=3)
    r, c, w = make_symmetric(data.graph)
    dense = np.zeros((50, 50))
    np.add.at(dense, (r, c), w)
    # rw-normalized over cols: column sums 1 for touched cols
    colsum = dense.sum(axis=0)
    touched = colsum > 0
    np.testing.assert_allclose(colsum[touched], 1.0, rtol=1e-5)
    de = dirichlet_energy(data.graph, np.asarray(data.x[:, :4]))
    assert de.shape == (4, 4)


def test_poincare_distances():
    emb = np.asarray([[0.0, 0.0], [0.5, 0.0], [0.0, 0.5]])
    d = poincare_distances(emb)
    assert d.shape == (3, 3)
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-9)
    np.testing.assert_allclose(d, d.T, rtol=1e-9)
    # closed form for origin↔(r,0): arccosh(1 + 2r²/(1−r²))
    want = np.arccosh(1 + 2 * 0.25 / (1 - 0.25))
    np.testing.assert_allclose(d[0, 1], want, rtol=1e-9)


def test_beltrami_gdc_cache_roundtrip():
    data = make_sbm_dataset(num_nodes=40, num_classes=3, seed=4)
    cfg = Config(dataset="ToyDs", pos_enc_type="GDC", gdc_k=8,
                 pos_enc_hidden_dim=8)
    with tempfile.TemporaryDirectory() as td:
        enc = apply_beltrami(data, cfg, cache_dir=td)
        assert enc.shape[0] == 40
        path = os.path.join(td, "pos_encodings", "ToyDs_GDC.pkl")
        assert os.path.exists(path)
        enc2 = apply_beltrami(data, cfg, cache_dir=td)  # cache hit
        np.testing.assert_allclose(enc, enc2)


def test_deepwalk_embeddings():
    data = make_sbm_dataset(num_nodes=60, num_classes=3, p_in=0.2,
                            p_out=0.01, seed=5)
    g = data.graph
    mask = np.asarray(g.edge_mask)
    emb, acc = deepwalk_embeddings(np.asarray(g.row)[mask],
                                   np.asarray(g.col)[mask], 60, dim=8,
                                   labels=np.asarray(data.y), epochs=1,
                                   walks_per_node=5, walk_length=10)
    assert emb.shape == (60, 8)
    assert np.isfinite(emb).all()
    assert 0.0 <= acc <= 1.0


def test_apply_knn_through_model():
    data = make_sbm_dataset(num_nodes=80, num_features=8, seed=6)
    cfg = Config(hidden_dim=8, rewire_KNN=True, rewire_KNN_T="T0",
                 rewire_KNN_k=6, method="euler", step_size=0.5,
                 self_loop_weight=1.0, input_dropout=0.0, dropout=0.0)
    model = make_gnn(cfg, num_features=8, num_classes=data.num_classes)
    params, state = model.init(jax.random.PRNGKey(0))
    g2 = apply_knn(cfg, model, params, state, data)
    assert int(g2.num_edges) > 0
    assert g2.num_nodes == 80


def test_fa_layer_model():
    data = make_sbm_dataset(num_nodes=60, num_features=8, seed=7)
    cfg = Config(hidden_dim=8, fa_layer=True, method="euler", step_size=0.5,
                 self_loop_weight=1.0, input_dropout=0.0, dropout=0.0)
    model = make_gnn_knn(cfg, num_features=8, num_classes=data.num_classes)
    params, state = model.init(jax.random.PRNGKey(0))
    assert "fa_block" in params
    from graphax.sparse import build

    fa_graph = build.build_graph(*build.full_adjacency(60), 60,
                                 self_loop_weight=1.0)
    logits, _, _ = model.apply(params, state, data.graph, data.x,
                               train=False, fa_graph=fa_graph)
    assert logits.shape == (60, data.num_classes)
    # without fa_graph the fa layer is skipped, still works
    logits2, _, _ = model.apply(params, state, data.graph, data.x,
                                train=False)
    assert logits2.shape == (60, data.num_classes)


def test_trainer_with_knn_rewiring():
    data = make_sbm_dataset(num_nodes=90, num_features=8, num_classes=3,
                            p_in=0.15, p_out=0.01, seed=8)
    cfg = Config(hidden_dim=8, rewire_KNN=True, rewire_KNN_T="T0",
                 rewire_KNN_k=5, rewire_KNN_epoch=2, method="euler",
                 step_size=0.5, time=1.0, self_loop_weight=1.0,
                 input_dropout=0.1, dropout=0.1, lr=0.02, no_early=True)
    trainer = Trainer(cfg, data)
    out = trainer.fit(epochs=4)
    assert np.isfinite(out["history"][-1]["loss"])
    # graph actually changed at epoch 2
    assert int(trainer.data.graph.num_edges) != int(data.graph.num_edges) or \
        trainer.data.graph is not data.graph
