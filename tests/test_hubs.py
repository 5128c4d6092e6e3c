"""Hub-slab SpMM (graphax.kernels.hubs): layout selection, value/gradient
parity vs the dense operator, and end-to-end dispatch through the
laplacian RHS (interpreter mode on CPU via the FORCE hook)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphax.kernels.dispatch import attach_tiles
from graphax.kernels.hubs import (
    attach_hubs, blocked_hub_values, build_hub_tiles, densify_hubs,
    spmm_hub_tiled,
)
from graphax.sparse import Graph


def powerlaw_graph(n=600, e=3000, hub_frac=0.5, n_hubs=12, seed=0):
    """Half the edges target a handful of hub columns (power-law stand-in),
    half are uniform."""
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, e)
    hubs = rng.choice(n, n_hubs, replace=False)
    col = np.where(rng.rand(e) < hub_frac, hubs[rng.randint(0, n_hubs, e)],
                   rng.randint(0, n, e))
    keep = row != col
    row, col = row[keep], col[keep]
    order = np.lexsort((col, row))
    w = (rng.rand(len(row)) + 0.1).astype(np.float32)
    g = Graph.from_edges(row[order], col[order], n, edge_weight=w[order])
    return dataclasses.replace(attach_tiles(g, tile=8, block_edges=32),
                               strategy="tiled")


def dense_reference(g):
    a = np.zeros((g.num_nodes, g.num_nodes), np.float32)
    row = np.asarray(g.row)[: int(g.num_edges)]
    col = np.asarray(g.col)[: int(g.num_edges)]
    w = np.asarray(g.edge_weight)[: int(g.num_edges)]
    np.add.at(a, (row, col), w)
    return a


def test_build_hub_tiles_selection():
    g = powerlaw_graph()
    ht = build_hub_tiles(g.row, g.col, g.num_nodes,
                         num_edges=int(g.num_edges), tile=8,
                         candidates=(16, 32), force=True)
    assert ht is not None
    # hub edges + rest edges partition the edge set
    rest_e = int(np.asarray(ht.rest.slot_mask).sum())
    assert ht.hub_edges + rest_e == int(g.num_edges)
    # the chosen hubs actually are the hottest columns
    indeg = np.bincount(np.asarray(g.col)[: int(g.num_edges)],
                        minlength=g.num_nodes)
    chosen = set(np.asarray(ht.hub_ids).tolist())
    top = set(np.argsort(indeg)[::-1][: ht.hub_size].tolist())
    assert len(chosen & top) >= ht.hub_size - 2  # ties may swap the tail


def test_spmm_hub_tiled_matches_dense(monkeypatch):
    from graphax.kernels import pallas_tiled, pallas_windows

    monkeypatch.setattr(pallas_tiled, "FORCE", True)
    monkeypatch.setattr(pallas_windows, "FORCE", True)
    g = powerlaw_graph(seed=3)
    ht = build_hub_tiles(g.row, g.col, g.num_nodes,
                         num_edges=int(g.num_edges), tile=8,
                         candidates=(16,), force=True)
    rng = np.random.RandomState(4)
    d = 5
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    hub, rest, rest_t = blocked_hub_values(g.edge_weight, ht)
    dense_hub = densify_hubs(hub, ht)
    got = spmm_hub_tiled(dense_hub, rest, rest_t, x, ht)
    want = dense_reference(g) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_spmm_hub_gradients(monkeypatch):
    from graphax.kernels import pallas_tiled, pallas_windows

    monkeypatch.setattr(pallas_tiled, "FORCE", True)
    monkeypatch.setattr(pallas_windows, "FORCE", True)
    g = powerlaw_graph(n=200, e=900, seed=5)
    ht = build_hub_tiles(g.row, g.col, g.num_nodes,
                         num_edges=int(g.num_edges), tile=8,
                         candidates=(16,), force=True)
    rng = np.random.RandomState(6)
    d = 4
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    probe = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    def loss_hub(vals, xx):
        hub, rest, rest_t = blocked_hub_values(vals, ht)
        out = spmm_hub_tiled(densify_hubs(hub, ht), rest, rest_t, xx, ht)
        return jnp.sum(out * probe)

    a = dense_reference(g)
    row = np.asarray(g.row)[: int(g.num_edges)]
    col = np.asarray(g.col)[: int(g.num_edges)]

    def loss_ref(vals, xx):
        e = int(g.num_edges)
        contrib = vals[:e, None] * xx[col] * probe[row]
        return jnp.sum(contrib)

    gv, gx = jax.grad(loss_hub, argnums=(0, 1))(g.edge_weight, x)
    rv, rx = jax.grad(loss_ref, argnums=(0, 1))(g.edge_weight, x)
    np.testing.assert_allclose(np.asarray(gx),
                               np.asarray(a).T @ np.asarray(probe),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv)[: int(g.num_edges)],
                               np.asarray(rv)[: int(g.num_edges)],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)


def test_laplacian_rhs_dispatches_hubs(monkeypatch):
    """make_fstate + laplacian RHS route through the hub path and match the
    plain edge-space RHS (values and grads through a train step)."""
    from graphax.kernels import pallas_tiled, pallas_windows
    from graphax.blocks.common import make_fstate
    from graphax.functions import get_function
    from graphax.functions.common import FuncState, prepare_scalars
    from graphax.train import Config

    monkeypatch.setattr(pallas_tiled, "FORCE", True)
    monkeypatch.setattr(pallas_windows, "FORCE", True)
    g = powerlaw_graph(seed=7)
    gh = attach_hubs(g, tile=8, candidates=(16,), force=True)
    assert gh.hubs is not None
    d = 6
    cfg = Config(function="laplacian", hidden_dim=d, add_source=True)
    f = get_function(cfg, d)
    p = prepare_scalars(f.init(jax.random.PRNGKey(0)), cfg, jnp.float32)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    fs_hub = make_fstate(gh, x, train=False)
    assert isinstance(fs_hub.wb, tuple)            # hub route engaged
    fs_edge = FuncState(graph=dataclasses.replace(g, strategy="edge"), x0=x)
    got = f.rhs(p, fs_hub, 0.0, x)
    want = f.rhs(p, fs_edge, 0.0, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss(fn_state, xx):
        return jnp.sum(f.rhs(p, fn_state, 0.0, xx) ** 2)

    gx = jax.grad(loss, argnums=1)(fs_hub, x)
    rx = jax.grad(loss, argnums=1)(fs_edge, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)


def test_attach_hubs_declines_uniform_at_scale():
    """Uniform in-degree at a size where streaming the dense blocks costs
    more than the gathers it would replace -> no hub layout."""
    rng = np.random.RandomState(9)
    n, e = 60_000, 120_000
    row = np.sort(rng.randint(0, n, e))
    col = rng.randint(0, n, e)
    ht = build_hub_tiles(row, col, n, candidates=(512, 1024))
    assert ht is None


def community_hub_graph(n=800, e=4800, seed=11):
    """Community-ordered graph with hub tail — the windowed+hub combo's
    target shape (arxiv-like)."""
    rng = np.random.RandomState(seed)
    window = 64
    comm = np.arange(n) // window
    src = rng.randint(0, n, e)
    r = rng.rand(e)
    # 60% in-community, 25% hub, 15% uniform
    in_comm = (comm[src] * window + rng.randint(0, window, e)) % n
    hubs = rng.choice(n, 10, replace=False)
    to_hub = hubs[rng.randint(0, 10, e)]
    uni = rng.randint(0, n, e)
    dst = np.where(r < 0.60, in_comm, np.where(r < 0.85, to_hub, uni))
    keep = src != dst
    src, dst = src[keep], dst[keep]
    order = np.lexsort((dst, src))
    w = (rng.rand(len(src)) + 0.1).astype(np.float32)
    return Graph.from_edges(src[order], dst[order], n,
                            edge_weight=w[order])


@pytest.mark.slow
def test_windowed_hub_spmm_matches_dense(monkeypatch):
    """Windowed strategy with hub extraction from the residual: values and
    grads through make_fstate + laplacian RHS vs the edge-space path."""
    from graphax.kernels import pallas_tiled, pallas_windows
    from graphax.kernels.dispatch import attach_windows
    from graphax.blocks.common import make_fstate
    from graphax.functions import get_function
    from graphax.functions.common import FuncState, prepare_scalars
    from graphax.train import Config

    monkeypatch.setattr(pallas_tiled, "FORCE", True)
    monkeypatch.setattr(pallas_windows, "FORCE", True)
    g0 = community_hub_graph()
    g = attach_windows(g0, window=64, tile=8, block_edges=64,
                       hubs="force")
    assert g.windows.hub is not None, "hub extraction must engage"
    hub_e = g.windows.hub.hub_edges
    rest_e = int(np.asarray(g.windows.hub.rest.slot_mask).sum())
    res_e = int(np.asarray(g.windows.residual.slot_mask).sum())
    assert hub_e + rest_e == res_e      # hub+rest partition the residual
    assert hub_e > 0

    d = 6
    cfg = Config(function="laplacian", hidden_dim=d, add_source=True)
    f = get_function(cfg, d)
    p = prepare_scalars(f.init(jax.random.PRNGKey(0)), cfg, jnp.float32)
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    fs_win = make_fstate(g, x, train=False)
    assert len(fs_win.wb) == 3                     # hub entry present
    fs_edge = FuncState(graph=dataclasses.replace(g0, strategy="edge"),
                        x0=x)
    got = f.rhs(p, fs_win, 0.0, x)
    want = f.rhs(p, fs_edge, 0.0, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss(fn_state, xx):
        return jnp.sum(f.rhs(p, fn_state, 0.0, xx) ** 2)

    gx = jax.grad(loss, argnums=1)(fs_win, x)
    rx = jax.grad(loss, argnums=1)(fs_edge, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sharded_spmm_hub_parity():
    """Hub-slab sharded SpMM (psum'd slab + dense hub blocks + reduced
    halo) == single-device SpMM, on the virtual CPU mesh; halo shrinks."""
    from jax.sharding import Mesh

    from graphax.dist.partition import (partition_graph, shard_nodes,
                                        unshard_nodes)
    from graphax.dist.sharded import sharded_spmm_hub
    from graphax.sparse import ops

    g = powerlaw_graph(n=640, e=3600, seed=21)
    rng = np.random.RandomState(22)
    d = 8
    x = rng.randn(g.num_nodes, d).astype(np.float32)
    want = np.asarray(ops.spmm(g.row, g.col, g.edge_weight,
                               jnp.asarray(x), g.num_nodes))

    for p in (2, 4):
        part = partition_graph(g, p)
        mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
        f = sharded_spmm_hub(mesh, part, candidates=(16, 32), tile=8,
                             force=True)
        assert getattr(f, "hub_size", 0) > 0
        assert f.halo_after < f.halo_before      # halo actually shrank
        xs = jnp.asarray(shard_nodes(x, part))
        got = unshard_nodes(np.asarray(f(xs)), part)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sharded_spmm_hub_fallback_uniform():
    """No hub structure at scale -> the factory returns the plain halo
    strategy unchanged (still correct)."""
    from jax.sharding import Mesh

    from graphax.dist.partition import (partition_graph, shard_nodes,
                                        unshard_nodes)
    from graphax.dist.sharded import sharded_spmm_hub
    from graphax.sparse import ops

    rng = np.random.RandomState(23)
    n, e, d = 512, 1500, 4
    row = rng.randint(0, n, e); col = rng.randint(0, n, e)
    keep = row != col
    order = np.lexsort((col[keep], row[keep]))
    w = (rng.rand(keep.sum()) + 0.1).astype(np.float32)
    g = Graph.from_edges(row[keep][order], col[keep][order], n,
                         edge_weight=w[order])
    x = rng.randn(n, d).astype(np.float32)
    want = np.asarray(ops.spmm(g.row, g.col, g.edge_weight,
                               jnp.asarray(x), n))
    part = partition_graph(g, 4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    # huge candidates: dense blocks can't pay on a uniform small graph
    f = sharded_spmm_hub(mesh, part, candidates=(512,), tile=8)
    xs = jnp.asarray(shard_nodes(x, part))
    got = unshard_nodes(np.asarray(f(xs)), part)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)



@pytest.mark.slow
def test_hub_gate_is_slot_aware():
    """The H-selection gain counts padded gather SLOTS shed by the rest
    layout, not covered edges: at arxiv-like per-tile degrees, ~5% hub
    coverage leaves the rest layout's auto block size (and so its slot
    count) unchanged (declines), while 30%+ drops it to a finer block
    size and sheds real slots (engages)."""
    rng = np.random.RandomState(31)
    n = 169_343
    row = np.sort(rng.randint(0, n, n * 14))

    def cols(hub_frac):
        hubs = rng.choice(n, 512, replace=False)
        pick = rng.rand(len(row)) < hub_frac
        return np.where(pick, hubs[rng.randint(0, 512, len(row))],
                        rng.randint(0, n, len(row)))

    # hub-skewed: with the finer block-size candidates even 5% coverage
    # sheds a block quantum (Eb 2048 -> 1792); 30% sheds far more
    ht5 = build_hub_tiles(row, cols(0.05), n)
    assert ht5 is not None
    ht = build_hub_tiles(row, cols(0.30), n)
    assert ht is not None and ht.hub_size >= 128
    from graphax.kernels.hubs import _layout_slots

    # the engaged layout really holds fewer gather slots than the full one
    full = _layout_slots(row, n, 128)
    rest_slots = int(np.prod(np.asarray(ht.rest.edge_slot).shape))
    assert rest_slots < full
    # uniform in-degree: nothing to shed (decline) — see also
    # test_attach_hubs_declines_uniform_at_scale
    assert build_hub_tiles(row, rng.randint(0, n, len(row)), n) is None
