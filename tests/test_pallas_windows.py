"""Parity tests for the windowed (block-dense) SpMM path (interpreter
mode on CPU; the same kernels run compiled on TPU). Pins the densify
kernel, forward values and gradients against the XLA segment ops, on
community-structured and adversarial uniform-random graphs, and the
end-to-end laplacian RHS routing through a windowed Graph."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphax.kernels import pallas_tiled, pallas_windows
from graphax.kernels.dispatch import attach_windows
from graphax.kernels.pallas_windows import (
    densify_windows, pallas_windowed_ok, spmm_windowed,
)
from graphax.kernels.windows import (
    blocked_window_values, build_window_tiles, community_order,
)
from graphax.sparse import Graph
from graphax.sparse import ops as xla_ops


@pytest.fixture(autouse=True)
def _force_windowed(monkeypatch):
    monkeypatch.setattr(pallas_windows, "FORCE", True)
    monkeypatch.setattr(pallas_tiled, "FORCE", True)


def clustered_graph(n=96, seed=0, tile=8, window=16, block_edges=16,
                    p_in=0.5, p_out=0.02):
    """SBM with communities the size of one window, ids already ordered."""
    rng = np.random.RandomState(seed)
    comm = np.arange(n) // window
    row, col = [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            p = p_in if comm[i] == comm[j] else p_out
            if rng.rand() < p:
                row.append(i)
                col.append(j)
    row, col = np.asarray(row), np.asarray(col)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    w = rng.rand(len(row)).astype(np.float32) + 0.1
    g = Graph.from_edges(row, col, n, edge_weight=w)
    return attach_windows(g, window=window, tile=tile,
                          block_edges=block_edges)


def random_graph(n=64, e=300, seed=1, tile=8, window=16, block_edges=16):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    keep = np.ones(e, bool)
    keep[1:] = (np.diff(row) != 0) | (np.diff(col) != 0)   # coalesce dups
    row, col = row[keep], col[keep]
    w = rng.rand(len(row)).astype(np.float32) + 0.1
    g = Graph.from_edges(row, col, n, edge_weight=w)
    return attach_windows(g, window=window, tile=tile,
                          block_edges=block_edges)


def _apply_windowed(ev, x, wt):
    win, res, res_t = blocked_window_values(ev, wt)
    dense = densify_windows(win, wt)
    return spmm_windowed(dense, res, res_t, x, wt)


def test_densify_matches_scatter():
    g = clustered_graph()
    wt = g.windows
    win, _, _ = blocked_window_values(g.edge_weight, wt)
    dense = np.asarray(densify_windows(win, wt))
    want = np.zeros_like(dense)
    e = int(g.num_edges)
    row = np.asarray(g.row)[:e]
    col = np.asarray(g.col)[:e]
    w = np.asarray(g.edge_weight)[:e]
    bw = np.asarray(wt.tile_win)
    for r, c, v in zip(row, col, w):
        t = r // wt.tile
        lc = c - bw[t] * wt.window
        if 0 <= lc < wt.window:
            want[t, r - t * wt.tile, lc] = v
    np.testing.assert_allclose(dense, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("maker", [clustered_graph, random_graph])
def test_windowed_forward_matches_xla(maker):
    g = maker()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(g.num_nodes, 5).astype(np.float32))
    got = _apply_windowed(g.edge_weight, x, g.windows)
    want = xla_ops.spmm(g.row, g.col, g.edge_weight, x, g.num_nodes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_windowed_split_covers_all_edges():
    g = clustered_graph()
    wt = g.windows
    n_win = int(np.asarray(wt.slot_mask).sum())
    n_res = int(np.asarray(wt.residual.slot_mask).sum())
    n_res_t = int(np.asarray(wt.residual_t.slot_mask).sum())
    assert n_win + n_res == int(g.num_edges)
    assert n_res_t == n_res
    # community-ordered SBM: the vast majority of edges are in-window
    assert n_win > 0.7 * int(g.num_edges)
    # every in-window local col is inside the window
    lcol = np.asarray(wt.lcol)[np.asarray(wt.slot_mask)]
    assert lcol.min() >= 0 and lcol.max() < wt.window
    # residual_t edge slots hit the same original-edge subset
    ids = np.asarray(wt.residual.edge_slot)[np.asarray(wt.residual.slot_mask)]
    ids_t = np.asarray(wt.residual_t.edge_slot)[
        np.asarray(wt.residual_t.slot_mask)]
    assert set(ids.tolist()) == set(ids_t.tolist())


@pytest.mark.slow
def test_windowed_gradients_match_xla():
    g = clustered_graph(seed=3)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(g.num_nodes, 6).astype(np.float32))
    probe = jnp.asarray(rng.randn(g.num_nodes, 6).astype(np.float32))

    def loss_win(ev, x):
        return jnp.sum(_apply_windowed(ev, x, g.windows) * probe)

    def loss_xla(ev, x):
        y = xla_ops.spmm(g.row, g.col, ev, x, g.num_nodes)
        return jnp.sum(y * probe)

    gw = jax.grad(loss_win, argnums=(0, 1))(g.edge_weight, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(g.edge_weight, x)
    e = int(g.num_edges)
    np.testing.assert_allclose(np.asarray(gw[0])[:e], np.asarray(gx[0])[:e],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-4)


def test_community_order_recovers_clusters():
    # shuffle a clustered graph's ids; community_order should bring
    # most edges back in-window
    n, window = 96, 16
    rng = np.random.RandomState(5)
    base = clustered_graph(n=n, window=window)
    e = int(base.num_edges)
    row = np.asarray(base.row)[:e]
    col = np.asarray(base.col)[:e]
    shuf = rng.permutation(n)
    r2, c2 = shuf[row], shuf[col]
    perm = community_order(r2, c2, n, window=window)
    r3, c3 = perm[r2], perm[c2]
    order = np.lexsort((c3, r3))
    wt = build_window_tiles(r3[order], c3[order], n, tile=8, window=window,
                            block_edges=16)
    frac = int(np.asarray(wt.slot_mask).sum()) / e
    assert frac > 0.6, frac


def test_community_reorder_preserves_dataset():
    # the reordered dataset is the same task up to a node permutation:
    # edge set maps through the permutation, features/labels/masks follow,
    # and an edge-strategy SpMM gives permuted outputs
    from graphax.data import community_reorder, make_sbm_dataset

    data = community_reorder(make_sbm_dataset(num_nodes=96, num_classes=4,
                                              p_in=0.3, p_out=0.02,
                                              num_per_class=5, seed=0),
                             window=16, tile=8, block_edges=16)
    g = data.graph
    assert g.strategy == "windowed" and g.windows is not None
    assert int(data.train_mask.sum()) > 0
    # degree multiset is permutation-invariant
    e = int(g.num_edges)
    deg = np.bincount(np.asarray(g.row)[:e], minlength=g.num_nodes)
    base = make_sbm_dataset(num_nodes=96, num_classes=4, p_in=0.3,
                            p_out=0.02, num_per_class=5, seed=0)
    e0 = int(base.graph.num_edges)
    deg0 = np.bincount(np.asarray(base.graph.row)[:e0],
                       minlength=base.graph.num_nodes)
    assert e == e0
    assert sorted(deg.tolist()) == sorted(deg0.tolist())
    # labels still align with features: same (label -> feature-mean) map
    for c in range(4):
        np.testing.assert_allclose(
            np.asarray(data.x)[np.asarray(data.y) == c].mean(),
            np.asarray(base.x)[np.asarray(base.y) == c].mean(), rtol=1e-5)


def test_community_reorder_falls_back_without_structure():
    # a structureless graph keeps the reordered ids but gets the row-tiled
    # layout — the windowed strategy would mostly pay its residual path
    from graphax.data import community_reorder, make_sbm_dataset

    d = make_sbm_dataset(num_nodes=256, num_classes=4, p_in=0.05,
                         p_out=0.05, num_per_class=5, seed=1)
    out = community_reorder(d, window=16, tile=8, block_edges=16,
                            min_in_window_frac=0.35)
    assert out.graph.strategy == "tiled" and out.graph.tiles is not None


def test_laplacian_rhs_routes_through_windowed():
    from graphax import Config
    from graphax.blocks.common import make_fstate, normalize_graph
    from graphax.functions import get_function
    from graphax.functions.common import FuncState, prepare_scalars

    g = clustered_graph(seed=6)
    cfg = Config(function="laplacian", hidden_dim=5, self_loop_weight=0.0)
    g = normalize_graph(cfg, g)
    assert pallas_windowed_ok(g, jnp.zeros((g.num_nodes, 5)))
    f = get_function(cfg, 5)
    params = prepare_scalars(f.init(jax.random.PRNGKey(0)), cfg, jnp.float32)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(g.num_nodes, 5).astype(np.float32))
    fs = make_fstate(g, x, train=True)
    assert isinstance(fs.wb, tuple) and fs.wb[0].ndim == 3
    got = f.rhs(params, fs, 0.0, x)
    fs_edge = FuncState(graph=dataclasses.replace(g, strategy="edge"), x0=x)
    want = f.rhs(params, fs_edge, 0.0, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
