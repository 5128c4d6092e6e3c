"""Parity tests for the Pallas tiled SpMM fast path (interpreter mode on
CPU; the same code path runs compiled on TPU). Pins forward values and
custom-vjp gradients against the XLA segment ops."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphax.kernels import pallas_tiled
from graphax.kernels.dispatch import attach_tiles
from graphax.kernels.pallas_tiled import blocked_values, spmm_pallas
from graphax.sparse import Graph
from graphax.sparse import ops as xla_ops


def make_graph(n=37, e=140, seed=0, tile=8, block_edges=16,
               with_isolated=True):
    rng = np.random.RandomState(seed)
    hi = n - 5 if with_isolated else n  # leave the last nodes edge-free
    row = rng.randint(0, hi, e)
    col = rng.randint(0, hi, e)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    w = rng.rand(e).astype(np.float32) + 0.1
    g = Graph.from_edges(row, col, n, edge_weight=w)
    g = attach_tiles(g, tile=tile, block_edges=block_edges)
    return dataclasses.replace(g, strategy="tiled")


@pytest.mark.parametrize("with_isolated", [False, True])
def test_spmm_pallas_forward_matches_xla(with_isolated):
    g = make_graph(with_isolated=with_isolated)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(g.num_nodes, 5).astype(np.float32))
    wb = blocked_values(g.edge_weight, g.tiles)
    wb_t = blocked_values(g.edge_weight, g.tiles_t)
    got = spmm_pallas(wb, wb_t, x, g.tiles, g.tiles_t)
    want = xla_ops.spmm(g.row, g.col, g.edge_weight, x, g.num_nodes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    if with_isolated:
        # isolated nodes sit in never-visited tiles — must come back 0
        np.testing.assert_allclose(np.asarray(got[-3:]), 0.0)


def test_spmm_pallas_gradients_match_xla():
    g = make_graph(n=41, e=200, seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(g.num_nodes, 6).astype(np.float32))
    probe = jnp.asarray(rng.randn(g.num_nodes, 6).astype(np.float32))

    def loss_pallas(ev, x):
        wb = blocked_values(ev, g.tiles)
        wb_t = blocked_values(ev, g.tiles_t)
        y = spmm_pallas(wb, wb_t, x, g.tiles, g.tiles_t)
        return jnp.sum(y * probe)

    def loss_xla(ev, x):
        return jnp.sum(xla_ops.spmm(g.row, g.col, ev, x, g.num_nodes) * probe)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(g.edge_weight, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(g.edge_weight, x)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-5, atol=1e-5)


def test_spmm_pallas_duplicate_edges_and_padding():
    # duplicate edges accumulate; padded edge-buffer slots contribute 0
    row = np.array([0, 0, 0, 1, 2, 2], np.int32)
    col = np.array([1, 1, 2, 0, 1, 1], np.int32)
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], np.float32)
    g = Graph.from_edges(row, col, 3, edge_weight=w, edge_buffer_size=8)
    g = attach_tiles(g, tile=8, block_edges=8)
    g = dataclasses.replace(g, strategy="tiled")
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(3, 2) + 1)
    wb = blocked_values(g.edge_weight, g.tiles)
    wb_t = blocked_values(g.edge_weight, g.tiles_t)
    got = spmm_pallas(wb, wb_t, x, g.tiles, g.tiles_t)
    want = xla_ops.spmm(g.row, g.col, g.edge_weight, x, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_laplacian_rhs_routes_through_pallas(monkeypatch):
    """End-to-end: make_fstate pre-blocks weights and the laplacian RHS
    produces the same dx/dt through the Pallas path as through XLA."""
    from graphax.blocks.common import make_fstate
    from graphax.functions import get_function
    from graphax.functions.common import prepare_scalars
    from graphax.train import Config

    monkeypatch.setattr(pallas_tiled, "FORCE", True)
    g = make_graph(n=33, e=120, seed=5)
    cfg = Config(function="laplacian", hidden_dim=4, add_source=True)
    f = get_function(cfg, 4)
    params = prepare_scalars(f.init(jax.random.PRNGKey(0)), cfg, jnp.float32)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(g.num_nodes, 4).astype(np.float32))

    fs = make_fstate(g, x)
    assert fs.wb is not None and fs.wb_t is not None
    dx_pallas = f.rhs(params, fs, 0.0, x)

    monkeypatch.setattr(pallas_tiled, "FORCE", False)
    fs2 = make_fstate(g, x)
    assert fs2.wb is None
    dx_xla = f.rhs(params, fs2, 0.0, x)
    np.testing.assert_allclose(np.asarray(dx_pallas), np.asarray(dx_xla),
                               rtol=1e-5, atol=1e-5)
