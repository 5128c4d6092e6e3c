"""Multi-chip tests on the virtual 8-device CPU mesh: partition coverage,
halo-exchange SpMM vs single-device oracle (bitwise-level allclose), the
all_gather strategy, sharded diffusion RHS inside a solver, gradient flow
through the collectives, and DP training step parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphax.dist import (
    make_mesh, partition_graph, sharded_spmm_allgather, sharded_spmm_halo,
    make_sharded_diffusion_step, make_dp_train_step,
)
from graphax.dist.partition import shard_nodes, unshard_nodes
from graphax.ode import odeint
from graphax.sparse import build
from graphax.sparse.ops import spmm


def random_graph(n=100, e=600, seed=0, self_loop=1.0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    keep = row != col
    return build.build_graph(row[keep], col[keep], n, make_undirected=True,
                             self_loop_weight=self_loop, pad_multiple=32)


def reference_spmm(g, x):
    return spmm(g.row, g.col, g.edge_weight, jnp.asarray(x), g.num_nodes)


@pytest.mark.parametrize("num_shards", [2, 4, 8])
def test_partition_covers_all_edges(num_shards):
    g = random_graph()
    part = partition_graph(g, num_shards)
    assert int(part.edge_mask.sum()) == int(g.num_edges)
    # every local col index within extended range
    assert part.local_col.max() < part.block_size + part.halo_size


@pytest.mark.parametrize("strategy", ["halo", "allgather"])
@pytest.mark.parametrize("num_shards", [2, 4, 8])
def test_sharded_spmm_matches_single_device(strategy, num_shards):
    g = random_graph(n=90, e=500, seed=1)
    mesh = make_mesh((num_shards,), ("graph",))
    part = partition_graph(g, num_shards)
    x = np.random.RandomState(2).randn(g.num_nodes, 16).astype(np.float32)

    f = (sharded_spmm_halo if strategy == "halo"
         else sharded_spmm_allgather)(mesh, part)
    xs = jnp.asarray(shard_nodes(x, part))
    out = unshard_nodes(np.asarray(f(xs)), part)
    expected = np.asarray(reference_spmm(g, x))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_diffusion_inside_solver():
    """Integrate the sharded GRAND-l RHS with dopri5 and compare to the
    single-device solve — the per-NFE halo exchange inside lax.while_loop."""
    g = random_graph(n=64, e=300, seed=3)
    mesh = make_mesh((4,), ("graph",))
    part = partition_graph(g, 4)
    x = np.random.RandomState(4).randn(g.num_nodes, 8).astype(np.float32)
    params = {"alpha_train": jnp.zeros(()), "beta_train": jnp.zeros(())}

    rhs = make_sharded_diffusion_step(mesh, part)
    xs0 = jnp.asarray(shard_nodes(x, part))
    res_sh = odeint(lambda t, y: rhs(params, y), xs0, 0.0, 2.0,
                    method="dopri5", rtol=1e-6, atol=1e-8)

    def rhs_single(t, y):
        ax = reference_spmm(g, y)
        return jax.nn.sigmoid(params["alpha_train"]) * (ax - y)

    res_1 = odeint(rhs_single, jnp.asarray(x), 0.0, 2.0, method="dopri5",
                   rtol=1e-6, atol=1e-8)
    out_sh = unshard_nodes(np.asarray(res_sh.y), part)
    np.testing.assert_allclose(out_sh, np.asarray(res_1.y), rtol=1e-4,
                               atol=1e-5)
    assert int(res_sh.nfe) == int(res_1.nfe)  # identical step sequences


@pytest.mark.slow
def test_gradients_through_halo_exchange():
    g = random_graph(n=48, e=200, seed=5)
    mesh = make_mesh((4,), ("graph",))
    part = partition_graph(g, 4)
    x = np.random.RandomState(6).randn(g.num_nodes, 4).astype(np.float32)
    spmm_sh = sharded_spmm_halo(mesh, part)

    def loss_sh(xs):
        return jnp.sum(spmm_sh(xs) ** 2)

    def loss_1(xf):
        return jnp.sum(reference_spmm(g, xf) ** 2)

    xs = jnp.asarray(shard_nodes(x, part))
    g_sh = unshard_nodes(np.asarray(jax.grad(loss_sh)(xs)), part)
    g_1 = np.asarray(jax.grad(loss_1)(jnp.asarray(x)))
    np.testing.assert_allclose(g_sh, g_1, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dp_train_step():
    mesh = make_mesh((8,), ("data",))
    w0 = {"w": jnp.zeros((4,))}
    xb = np.random.RandomState(0).randn(16, 4).astype(np.float32)
    yb = (xb @ np.array([1., -2., 3., 0.5])).astype(np.float32)

    def loss_fn(params, batch, rng):
        x, y = batch
        pred = x @ params["w"]
        return jnp.mean((pred - y) ** 2)

    tx = optax.sgd(0.05)
    step = make_dp_train_step(mesh, loss_fn, tx)
    params, opt_state = w0, tx.init(w0)
    batch = (jnp.asarray(xb), jnp.asarray(yb))
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.fold_in(rng, i))
        losses.append(float(jnp.ravel(loss)[0]))
    assert losses[-1] < losses[0] * 0.1
    np.testing.assert_allclose(np.asarray(params["w"]),
                               [1., -2., 3., 0.5], atol=0.3)


def test_sharded_attention_rhs_matches_single_device():
    """Full GRAND-nl RHS (SDDMM + softmax + SpMM) sharded over 4 devices
    equals the single-device transformer RHS."""
    from graphax import Config
    from graphax.dist import make_sharded_attention_rhs
    from graphax.functions import get_function
    from graphax.functions.common import FuncState
    import dataclasses

    cfg = Config(function="transformer", heads=2, attention_dim=16,
                 hidden_dim=8, attention_type="scaled_dot",
                 attention_norm_idx=0, self_loop_weight=1.0,
                 add_source=True)
    g = random_graph(n=64, e=300, seed=7, self_loop=1.0)
    g = dataclasses.replace(g, strategy="edge")
    mesh = make_mesh((4,), ("graph",))
    part = partition_graph(g, 4)

    rng = np.random.RandomState(8)
    x = rng.randn(g.num_nodes, 8).astype(np.float32)
    x0 = rng.randn(g.num_nodes, 8).astype(np.float32)

    func = get_function(cfg, 8)
    params = func.init(jax.random.PRNGKey(9))
    params["att"]["Q"]["w"] = params["att"]["Q"]["w"] + \
        0.3 * jax.random.normal(jax.random.PRNGKey(10), (8, 16))
    params["att"]["K"]["w"] = params["att"]["K"]["w"] + \
        0.3 * jax.random.normal(jax.random.PRNGKey(11), (8, 16))

    # single device (edge weights = raw ones; sharded path uses raw too)
    dx_1 = func.rhs(params, FuncState(graph=g, x0=jnp.asarray(x0)), 0.0,
                    jnp.asarray(x))

    rhs_sh = make_sharded_attention_rhs(mesh, part, cfg)
    alpha = jax.nn.sigmoid(params["alpha_train"])
    ab = jnp.stack([alpha, params["beta_train"]])
    xs = jnp.asarray(shard_nodes(x, part))
    x0s = jnp.asarray(shard_nodes(x0, part))
    dxs = rhs_sh(params["att"], ab, xs, x0s)
    dx_sh = unshard_nodes(np.asarray(dxs), part)
    np.testing.assert_allclose(dx_sh, np.asarray(dx_1), rtol=2e-4, atol=1e-5)


def test_distributed_quantile():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from graphax.dist import distributed_masked_quantile
    import functools

    mesh = make_mesh((4,), ("graph",))
    qfn = distributed_masked_quantile(mesh)
    rng = np.random.RandomState(0)
    vals = rng.rand(4, 1000).astype(np.float32)
    mask = np.ones((4, 1000), bool)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("graph"), P("graph")), out_specs=P())
    def run(v, m):
        return qfn(v[0], m[0], 0.75, 0.0, 1.0)

    got = float(np.ravel(np.asarray(run(jnp.asarray(vals),
                                        jnp.asarray(mask))))[0])
    want = float(np.quantile(vals, 0.75))
    assert abs(got - want) < 0.01  # histogram approximation


def test_sharded_knn():
    from graphax.dist import sharded_knn_candidates

    mesh = make_mesh((4,), ("graph",))
    rng = np.random.RandomState(1)
    z = rng.randn(64, 6).astype(np.float32)
    zs = z.reshape(4, 16, 6)
    knn = sharded_knn_candidates(mesh, k=5)
    idx = np.asarray(knn(jnp.asarray(zs))).reshape(64, 5)
    d = ((z[:, None] - z[None]) ** 2).sum(-1)
    for i in range(64):
        kth = np.sort(d[i])[4]
        assert all(d[i, j] <= kth + 1e-5 for j in idx[i])


@pytest.mark.parametrize("function", ["laplacian", "transformer"])
def test_sharded_grand_trainer_end_to_end(function):
    """The reusable multi-chip trainer: loss decreases and sharded logits
    match a reference recomputation of the same model single-device."""
    from graphax import Config
    from graphax.dist import make_sharded_grand_trainer
    from graphax.data import make_sbm_dataset
    import dataclasses

    data = make_sbm_dataset(num_nodes=96, num_classes=3, num_features=12,
                            p_in=0.15, p_out=0.01, feature_noise=2.0, seed=0)
    g = dataclasses.replace(data.graph, strategy="edge")
    mesh = make_mesh((4,), ("graph",))
    part = partition_graph(g, 4)
    cfg = Config(hidden_dim=16, function=function, heads=2, attention_dim=16,
                 method="euler", step_size=0.5, time=2.0, lr=0.03,
                 add_source=True, self_loop_weight=1.0)
    # normalize weights once (the factory uses partition weights as-is)
    from graphax.blocks.common import normalize_graph

    gn = normalize_graph(cfg, g)
    part = partition_graph(gn, 4)

    init_params, train_step, eval_logits = make_sharded_grand_trainer(
        mesh, part, cfg, num_features=12, num_classes=3)
    import optax

    params = init_params(jax.random.PRNGKey(0))
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    xs = jnp.asarray(shard_nodes(np.asarray(data.x), part))
    ys = jnp.asarray(shard_nodes(np.asarray(data.y)[:, None], part))[..., 0]
    masks = jnp.asarray(shard_nodes(
        np.asarray(data.train_mask)[:, None], part))[..., 0]

    losses = []
    for _ in range(25):
        params, opt_state, loss = train_step(params, opt_state, xs, ys,
                                             masks)
        losses.append(float(np.ravel(np.asarray(loss))[0]))
    assert losses[-1] < losses[0] * 0.7

    logits = unshard_nodes(np.asarray(eval_logits(params, xs)), part)
    acc = (logits.argmax(1) == np.asarray(data.y))[
        np.asarray(data.train_mask)].mean()
    assert acc > 0.6  # learned something on train nodes


def _community_graph_shuffled(n=240, parts=4, seed=3):
    """SBM whose communities do NOT align with node-id order (ids shuffled)
    — raw contiguous blocks cut most edges, BFS growing recovers them."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    block = n // parts
    rows, cols = [], []
    for c in range(parts):
        ids = perm[c * block:(c + 1) * block]
        r = ids[rng.randint(0, block, 900)]
        s = ids[rng.randint(0, block, 900)]
        rows.append(r); cols.append(s)
    # sparse cross-community edges
    rows.append(rng.randint(0, n, 40)); cols.append(rng.randint(0, n, 40))
    row = np.concatenate(rows); col = np.concatenate(cols)
    keep = row != col
    return build.build_graph(row[keep], col[keep], n, make_undirected=True,
                             self_loop_weight=1.0, pad_multiple=16)


@pytest.mark.slow
def test_bfs_partition_parity_and_smaller_halo():
    from jax.sharding import Mesh
    from graphax.dist.sharded import sharded_spmm_halo

    g = _community_graph_shuffled()
    x = np.random.RandomState(0).randn(g.num_nodes, 8).astype(np.float32)
    want = np.asarray(reference_spmm(g, x))

    halos = {}
    for method in ("contiguous", "bfs"):
        part = partition_graph(g, 4, method=method)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
        f = sharded_spmm_halo(mesh, part)
        xs = jnp.asarray(shard_nodes(x, part))
        got = unshard_nodes(np.asarray(f(xs)), part)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        halos[method] = part.halo_size
    # BFS recovers the shuffled communities -> much smaller halo
    assert halos["bfs"] * 2 <= halos["contiguous"], halos


def test_bfs_partition_balanced_and_covering():
    g = _community_graph_shuffled(seed=9)
    part = partition_graph(g, 4, method="bfs")
    assert int(part.edge_mask.sum()) == int(g.num_edges)
    sizes = part.node_mask.sum(axis=1)
    assert sizes.sum() == g.num_nodes
    assert sizes.max() <= part.block_size
    # node_ids is a permutation of all nodes
    ids = part.node_ids[part.node_ids >= 0]
    assert sorted(ids.tolist()) == list(range(g.num_nodes))


@pytest.mark.parametrize("method", ["contiguous", "bfs"])
@pytest.mark.slow
def test_sharded_spmm_tiled_local_compute(method):
    """use_tiles=True routes the per-shard reduction through the row-tiled
    MXU path (no E-sized scatters) — must match both the plain sharded
    path and the single-device SpMM."""
    from jax.sharding import Mesh
    from graphax.dist.sharded import sharded_spmm_halo

    g = _community_graph_shuffled(seed=5)
    x = np.random.RandomState(1).randn(g.num_nodes, 12).astype(np.float32)
    want = np.asarray(reference_spmm(g, x))
    part = partition_graph(g, 4, method=method)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    xs = jnp.asarray(shard_nodes(x, part))
    f_plain = sharded_spmm_halo(mesh, part, use_tiles=False)
    f_tiled = sharded_spmm_halo(mesh, part, use_tiles=True)
    got_plain = unshard_nodes(np.asarray(f_plain(xs)), part)
    got_tiled = unshard_nodes(np.asarray(f_tiled(xs)), part)
    np.testing.assert_allclose(got_tiled, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_tiled, got_plain, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("method", ["contiguous", "bfs"])
@pytest.mark.slow
def test_sharded_spmm_windowed(method):
    """The windowed (block-dense) sharded strategy: per-shard in-window
    edges densified once per forward, per-NFE block matmul against the
    extended-state window slabs + residual segment-sum — must match the
    single-device SpMM, with gradients flowing through prepare and the
    collectives."""
    from jax.sharding import Mesh
    from graphax.dist.sharded import sharded_spmm_windowed

    g = _community_graph_shuffled(seed=7)
    x = np.random.RandomState(4).randn(g.num_nodes, 12).astype(np.float32)
    want = np.asarray(reference_spmm(g, x))
    part = partition_graph(g, 4, method=method)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    xs = jnp.asarray(shard_nodes(x, part))
    prepare, f = sharded_spmm_windowed(mesh, part, window=32, tile=8)
    state = prepare()
    got = unshard_nodes(np.asarray(f(xs, state)), part)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    if method == "bfs":
        # community partition + community-contiguous local ids ⇒ most edges
        # served by the dense blocks
        dense, res_vals = state
        total = int(part.edge_mask.sum())
        n_res = int((np.asarray(res_vals) != 0).sum())
        assert n_res < 0.5 * total, (n_res, total)

    # gradients: d/dx sum(A@x)^2 and d/dweights through prepare's scatter
    base_w = jnp.asarray(part.edge_weight * part.edge_mask)

    def loss_sharded(xs, w):
        return jnp.sum(f(xs, prepare(w)) ** 2)

    gx_s, gw_s = jax.grad(loss_sharded, argnums=(0, 1))(xs, base_w)

    def loss_single(xv):
        y = spmm(g.row, g.col, g.edge_weight, xv, g.num_nodes)
        return jnp.sum(y ** 2)

    gx_single = np.asarray(jax.grad(loss_single)(jnp.asarray(x)))
    gx_got = unshard_nodes(np.asarray(gx_s), part)
    np.testing.assert_allclose(gx_got, gx_single, rtol=2e-4, atol=2e-4)
    assert np.isfinite(np.asarray(gw_s)).all()
    assert float(jnp.abs(gw_s).sum()) > 0


@pytest.mark.parametrize("method", ["contiguous", "bfs"])
@pytest.mark.slow
def test_sharded_spmm_halo_overlap(method):
    """The overlap-structured SpMM (local partial independent of the
    all_to_all) matches both the serial halo path and the single-device
    oracle."""
    from jax.sharding import Mesh
    from graphax.dist.sharded import (
        sharded_spmm_halo, sharded_spmm_halo_overlap,
    )

    g = _community_graph_shuffled(seed=11)
    x = np.random.RandomState(2).randn(g.num_nodes, 12).astype(np.float32)
    want = np.asarray(reference_spmm(g, x))
    part = partition_graph(g, 4, method=method)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    xs = jnp.asarray(shard_nodes(x, part))
    got = unshard_nodes(
        np.asarray(sharded_spmm_halo_overlap(mesh, part)(xs)), part)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # gradients through the split-edge structure
    f = sharded_spmm_halo_overlap(mesh, part)
    gx = jax.grad(lambda a: jnp.sum(f(a) ** 2))(xs)
    f0 = sharded_spmm_halo(mesh, part)
    gx0 = jax.grad(lambda a: jnp.sum(f0(a) ** 2))(xs)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("overlap", [False, True])
def test_sharded_spmm_windowed_overlap_parity(overlap):
    """overlap=True (local-window tiles + local residual scheduled during
    the exchange) is numerically identical to the serial windowed path."""
    from jax.sharding import Mesh
    from graphax.dist.sharded import sharded_spmm_windowed

    g = _community_graph_shuffled(seed=13)
    x = np.random.RandomState(5).randn(g.num_nodes, 12).astype(np.float32)
    want = np.asarray(reference_spmm(g, x))
    part = partition_graph(g, 4, method="bfs")
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    xs = jnp.asarray(shard_nodes(x, part))
    prepare, f = sharded_spmm_windowed(mesh, part, window=32, tile=8,
                                       overlap=overlap)
    state = prepare()
    got = unshard_nodes(np.asarray(f(xs, state)), part)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    base_w = jnp.asarray(part.edge_weight * part.edge_mask)
    gx, gw = jax.grad(
        lambda a, w: jnp.sum(f(a, prepare(w)) ** 2), argnums=(0, 1))(
            xs, base_w)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gw)).all()
