"""Dense-strategy parity: the [N,N]-operator path must match the edge-space
segment path on every RHS and block, for all attention types and both norm
indices."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax import Config
from graphax.blocks import get_block
from graphax.functions import get_function
from graphax.functions.common import FuncState
from graphax.kernels.dense_path import (
    dense_adjacency_mask, dense_edge_values, densify, masked_softmax,
)
from graphax.sparse import Graph, build
from graphax.sparse import ops as xla_ops


def graphs(n=120, e=600, seed=0):
    rng = np.random.RandomState(seed)
    row, col = rng.randint(0, n, e), rng.randint(0, n, e)
    keep = row != col
    r, c, w = build.add_self_loops(*build.to_undirected(row[keep], col[keep], n),
                                   None, 1.0, n)
    g_dense = dataclasses.replace(
        Graph.from_edges(r, c, n, w, edge_buffer_size=len(r) + 32),
        strategy="dense")
    g_edge = dataclasses.replace(g_dense, strategy="edge")
    return g_dense, g_edge


def test_densify_matches_to_dense():
    g, _ = graphs()
    d = densify(g, g.edge_weight)
    np.testing.assert_allclose(d, np.asarray(g.to_dense()), rtol=1e-6)


def test_masked_softmax_matches_segment():
    g, _ = graphs(seed=1)
    rng = np.random.RandomState(1)
    scores_e = jnp.asarray(rng.randn(g.edge_buffer_size), jnp.float32)
    want = xla_ops.segment_softmax(scores_e[:, None], g.row, g.num_nodes,
                                   mask=g.edge_mask)[:, 0]
    dense_scores = densify(g, scores_e)  # scores at edge positions
    mask = dense_adjacency_mask(g)
    att_dense = masked_softmax(dense_scores, mask, axis=1)
    got = dense_edge_values(g, att_dense)
    np.testing.assert_allclose(got, jnp.where(g.edge_mask, want, 0),
                               rtol=1e-5, atol=1e-6)


def test_laplacian_rhs_dense_vs_edge():
    cfg = Config(hidden_dim=8, function="laplacian", self_loop_weight=1.0)
    g_d, g_e = graphs(seed=2)
    from graphax.blocks.common import make_fstate, normalize_graph

    func = get_function(cfg, 8)
    params = func.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(2).randn(120, 8), jnp.float32)
    fs_d = make_fstate(normalize_graph(cfg, g_d), x)
    fs_e = make_fstate(normalize_graph(cfg, g_e), x)
    assert fs_d.dense_adj is not None and fs_e.dense_adj is None
    np.testing.assert_allclose(func.rhs(params, fs_d, 0.0, x),
                               func.rhs(params, fs_e, 0.0, x),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim", "pearson",
                                      "exp_kernel"])
@pytest.mark.parametrize("norm_idx", [0, 1])
@pytest.mark.parametrize("square_plus", [False, True])
def test_transformer_rhs_dense_vs_edge(att_type, norm_idx, square_plus):
    cfg = Config(hidden_dim=8, function="transformer", heads=2,
                 attention_dim=8, attention_type=att_type,
                 attention_norm_idx=norm_idx, square_plus=square_plus,
                 self_loop_weight=1.0)
    g_d, g_e = graphs(seed=3)
    func = get_function(cfg, 8)
    params = func.init(jax.random.PRNGKey(1))
    # give Q/K real spread so attention is non-uniform
    params["att"]["Q"]["w"] = params["att"]["Q"]["w"] + \
        0.3 * jax.random.normal(jax.random.PRNGKey(2), (8, 8))
    params["att"]["K"]["w"] = params["att"]["K"]["w"] + \
        0.3 * jax.random.normal(jax.random.PRNGKey(3), (8, 8))
    x = jnp.asarray(np.random.RandomState(3).randn(120, 8), jnp.float32)
    dx_d = func.rhs(params, FuncState(graph=g_d, x0=x), 0.0, x)
    dx_e = func.rhs(params, FuncState(graph=g_e, x0=x), 0.0, x)
    np.testing.assert_allclose(dx_d, dx_e, rtol=2e-4, atol=1e-5)


def test_transformer_mix_features_dense_vs_edge():
    cfg = Config(hidden_dim=8, function="transformer", heads=2,
                 attention_dim=8, mix_features=True, self_loop_weight=1.0)
    g_d, g_e = graphs(seed=4)
    func = get_function(cfg, 8)
    params = func.init(jax.random.PRNGKey(4))
    x = jnp.asarray(np.random.RandomState(4).randn(120, 8), jnp.float32)
    dx_d = func.rhs(params, FuncState(graph=g_d, x0=x), 0.0, x)
    dx_e = func.rhs(params, FuncState(graph=g_e, x0=x), 0.0, x)
    np.testing.assert_allclose(dx_d, dx_e, rtol=2e-4, atol=1e-5)


def test_block_forward_dense_vs_edge():
    cfg = Config(hidden_dim=8, block="attention", function="laplacian",
                 heads=2, attention_dim=8, method="rk4", step_size=0.5,
                 time=2.0, self_loop_weight=1.0)
    g_d, g_e = graphs(seed=5)
    blk = get_block(cfg, 8)
    params = blk.init(jax.random.PRNGKey(5))
    x = jnp.asarray(np.random.RandomState(5).randn(120, 8), jnp.float32)
    out_d = blk.forward(params, g_d, x, train=False)
    out_e = blk.forward(params, g_e, x, train=False)
    np.testing.assert_allclose(out_d.z, out_e.z, rtol=2e-4, atol=1e-5)


def test_gradients_dense_path():
    cfg = Config(hidden_dim=8, function="transformer", heads=2,
                 attention_dim=8, self_loop_weight=1.0)
    g_d, _ = graphs(seed=6)
    func = get_function(cfg, 8)
    params = func.init(jax.random.PRNGKey(6))
    x = jnp.asarray(np.random.RandomState(6).randn(120, 8), jnp.float32)

    def loss(p):
        return jnp.sum(func.rhs(p, FuncState(graph=g_d, x0=x), 0.0, x) ** 2)

    flat, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params))
    assert np.isfinite(np.asarray(flat)).all()


def test_build_graph_auto_strategy():
    g_small = build.build_graph([0, 1], [1, 0], 10, self_loop_weight=1.0)
    assert g_small.strategy == "dense"
    rng = np.random.RandomState(0)
    n = 25_000
    g_big = build.build_graph(rng.randint(0, n, 1000),
                              rng.randint(0, n, 1000), n)
    assert g_big.strategy == "tiled"
    assert g_big.tiles is not None
