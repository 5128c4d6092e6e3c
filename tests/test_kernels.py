"""MXU-tiled kernel parity: every tiled op must match the XLA segment op
bit-for-bit-level (f32 allclose) on random graphs, including padding edges,
empty rows, multi-block tiles, and the full attention RHS through dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax import Config
from graphax.functions import get_function
from graphax.functions.common import FuncState
from graphax.kernels import build_row_tiles
from graphax.kernels.dispatch import attach_tiles
from graphax.kernels.segment_mxu import (
    tiled_segment_max, tiled_segment_softmax, tiled_segment_sum, tiled_spmm,
    tiled_spmm_multihead,
)
from graphax.sparse import Graph, build
from graphax.sparse import ops as xla_ops


def sorted_graph(n=300, e=1500, seed=0, buffer_pad=64):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    keep = row != col
    # coalesce sorts by (row, col)
    r, c, w = build.coalesce(row[keep], col[keep], None, n)
    g = Graph.from_edges(r, c, n, w,
                         edge_buffer_size=len(r) + buffer_pad)
    return attach_tiles(g, tile=128, block_edges=256)


def test_tiled_segment_sum_matches():
    g = sorted_graph()
    rng = np.random.RandomState(1)
    vals = jnp.asarray(rng.randn(g.edge_buffer_size, 7), jnp.float32)
    vals = vals * g.edge_mask[:, None]
    got = tiled_segment_sum(vals, g.tiles)
    want = xla_ops.segment_sum(vals, g.row, g.num_nodes)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tiled_segment_sum_scalar():
    g = sorted_graph(seed=2)
    rng = np.random.RandomState(2)
    vals = jnp.asarray(rng.rand(g.edge_buffer_size), jnp.float32)
    vals = vals * g.edge_mask
    got = tiled_segment_sum(vals, g.tiles)
    want = xla_ops.segment_sum(vals, g.row, g.num_nodes)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tiled_segment_max_matches():
    g = sorted_graph(seed=3)
    rng = np.random.RandomState(3)
    vals = jnp.asarray(rng.randn(g.edge_buffer_size), jnp.float32)
    got = tiled_segment_max(vals, g.tiles)
    want = xla_ops.segment_max(jnp.where(g.edge_mask, vals, -1e30), g.row,
                               g.num_nodes)
    mask_rows = np.asarray(want) > -1e29  # rows with at least one edge
    np.testing.assert_allclose(np.asarray(got)[mask_rows],
                               np.asarray(want)[mask_rows], rtol=1e-6)


def test_tiled_softmax_matches():
    g = sorted_graph(seed=4)
    rng = np.random.RandomState(4)
    scores = jnp.asarray(rng.randn(g.edge_buffer_size, 4), jnp.float32)
    got = tiled_segment_softmax(scores, g.row, g.tiles, mask=g.edge_mask)
    want = xla_ops.segment_softmax(scores, g.row, g.num_nodes,
                                   mask=g.edge_mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tiled_spmm_matches():
    g = sorted_graph(seed=5)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(g.num_nodes, 33), jnp.float32)
    got = tiled_spmm(g.edge_weight, x, g.tiles)
    want = xla_ops.spmm(g.row, g.col, g.edge_weight, x, g.num_nodes)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tiled_multihead_matches():
    g = sorted_graph(seed=6)
    rng = np.random.RandomState(6)
    att = jnp.asarray(rng.rand(g.edge_buffer_size, 2), jnp.float32)
    att = att * g.edge_mask[:, None]
    v = jnp.asarray(rng.randn(g.num_nodes, 2, 5), jnp.float32)
    got = tiled_spmm_multihead(att, v, g.tiles)
    want = xla_ops.spmm_multihead(g.row, g.col, att, v, g.num_nodes)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("att_type", ["scaled_dot", "exp_kernel"])
@pytest.mark.parametrize("square_plus", [False, True])
def test_attention_rhs_fast_path_parity(att_type, square_plus):
    """The full transformer RHS via dispatch: tiled vs XLA paths agree."""
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=6, attention_type=att_type,
                 square_plus=square_plus, self_loop_weight=1.0,
                 attention_norm_idx=0)
    g_tiled = sorted_graph(n=200, e=900, seed=7)
    import dataclasses
    g_plain = dataclasses.replace(g_tiled, tiles=None)

    func = get_function(cfg, 6)
    params = func.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(8).randn(200, 6), jnp.float32)

    dx_tiled = func.rhs(params, FuncState(graph=g_tiled, x0=x), 0.0, x)
    dx_plain = func.rhs(params, FuncState(graph=g_plain, x0=x), 0.0, x)
    np.testing.assert_allclose(dx_tiled, dx_plain, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_gradients_through_tiled_path():
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=6, self_loop_weight=1.0)
    g = sorted_graph(n=150, e=700, seed=9)
    func = get_function(cfg, 6)
    params = func.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(9).randn(150, 6), jnp.float32)

    def loss(params):
        dx = func.rhs(params, FuncState(graph=g, x0=x), 0.0, x)
        return jnp.sum(dx ** 2)

    grads = jax.grad(loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0


def test_hub_node_multiple_blocks():
    """A node with degree > block_edges forces multi-block tiles."""
    n = 1000
    hub_edges = 700  # hub row 0 with 700 distinct cols > block_edges=256
    rng = np.random.RandomState(10)
    row = np.concatenate([np.zeros(hub_edges, np.int64),
                          rng.randint(1, n, 100)])
    col = np.concatenate([1 + rng.permutation(n - 1)[:hub_edges],
                          rng.randint(0, n, 100)])
    r, c, w = build.coalesce(row, col, None, n)
    g = Graph.from_edges(r, c, n, w, edge_buffer_size=len(r) + 16)
    g = attach_tiles(g, tile=128, block_edges=256)
    assert g.tiles.num_blocks >= 3
    x = jnp.asarray(rng.randn(n, 5), jnp.float32)
    got = tiled_spmm(g.edge_weight, x, g.tiles)
    want = xla_ops.spmm(g.row, g.col, g.edge_weight, x, g.num_nodes)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim", "pearson",
                                      "exp_kernel"])
@pytest.mark.parametrize("square_plus", [False, True])
def test_fused_attention_rhs_parity(att_type, square_plus):
    """Block-layout fused attention RHS == edge-space path."""
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=6, attention_type=att_type,
                 square_plus=square_plus, attention_norm_idx=0,
                 self_loop_weight=1.0)
    g_tiled = sorted_graph(n=200, e=900, seed=11)
    import dataclasses
    g_plain = dataclasses.replace(g_tiled, tiles=None)

    func = get_function(cfg, 6)
    params = func.init(jax.random.PRNGKey(12))
    # spread Q/K so attention is non-uniform
    params["att"]["Q"]["w"] = params["att"]["Q"]["w"] + \
        0.3 * jax.random.normal(jax.random.PRNGKey(13), (6, 8))
    params["att"]["K"]["w"] = params["att"]["K"]["w"] + \
        0.3 * jax.random.normal(jax.random.PRNGKey(14), (6, 8))
    x = jnp.asarray(np.random.RandomState(15).randn(200, 6), jnp.float32)
    dx_f = func.rhs(params, _fs(g_tiled, x), 0.0, x)
    dx_e = func.rhs(params, _fs(g_plain, x), 0.0, x)
    np.testing.assert_allclose(dx_f, dx_e, rtol=2e-4, atol=1e-5)


def _fs(g, x):
    from graphax.functions.common import FuncState
    return FuncState(graph=g, x0=x)


def test_fused_attention_gradients():
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=6, attention_norm_idx=0, self_loop_weight=1.0)
    g = sorted_graph(n=150, e=700, seed=16)
    func = get_function(cfg, 6)
    params = func.init(jax.random.PRNGKey(17))
    x = jnp.asarray(np.random.RandomState(18).randn(150, 6), jnp.float32)

    def loss(p):
        return jnp.sum(func.rhs(p, _fs(g, x), 0.0, x) ** 2)

    flat, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(params))
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0
