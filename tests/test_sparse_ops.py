"""Sparse-layer tests pinning the reference's normalization invariants
(`test/test_utils.py:27-77`): rw-normalized adjacency equals sklearn-style L1
row/col normalization for several self-loop weights, on the same toy 3-node
graph the reference uses; segment softmax/squareplus sum to 1 per segment;
SpMM matches dense matmul; padding never leaks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax.sparse import (
    Graph, build, segment_softmax, squareplus_norm, spmm, spmm_multihead,
    sddmm_dot, rw_norm_weights, gcn_norm_weights,
)

# The reference's recurring toy fixture (`test/test_attention.py:26-31`):
EDGE = np.array([[0, 2, 2, 1], [1, 0, 1, 2]])
X = np.array([[1., 2.], [3., 2.], [4., 5.]])
N = 3


def dense_from(row, col, w, n=N):
    d = np.zeros((n, n))
    np.add.at(d, (np.asarray(row), np.asarray(col)), np.asarray(w))
    return d


@pytest.mark.parametrize("fill", [0.0, 0.3, 1.0, 3.2])
@pytest.mark.parametrize("norm_dim", [0, 1])
def test_rw_norm_matches_l1_normalize(fill, norm_dim):
    """`get_rw_adj` oracle (`test/test_utils.py:27-77`): after adding
    self-loops of weight `fill`, the adjacency L1-normalized along norm_dim
    equals the rw weights."""
    row, col, w = build.add_self_loops(EDGE[0], EDGE[1], None, fill, N) \
        if fill else build.coalesce(EDGE[0], EDGE[1], None, N)
    g = Graph.from_edges(row, col, N, w, edge_buffer_size=16)
    rw = rw_norm_weights(g.row, g.col, g.edge_weight, N, norm_dim=norm_dim,
                         mask=g.edge_mask)
    got = dense_from(g.row, g.col, rw)

    raw = dense_from(row, col, w)
    axis = 1 - norm_dim  # norm_dim=0 → row degree normalizes rows? no: see below
    # reference: norm_dim=0 divides by degree over `row` index → each row of A
    # sums to 1; norm_dim=1 divides by degree over `col` → columns sum to 1.
    sums = raw.sum(axis=1 - norm_dim, keepdims=True) if norm_dim == 0 \
        else raw.sum(axis=0, keepdims=True)
    expected = np.divide(raw, np.where(sums == 0, 1, sums))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_gcn_norm_symmetric():
    row, col, w = build.add_self_loops(EDGE[0], EDGE[1], None, 1.0, N)
    g = Graph.from_edges(row, col, N, w, edge_buffer_size=8)
    gw = gcn_norm_weights(g.row, g.col, g.edge_weight, N, mask=g.edge_mask)
    got = dense_from(g.row, g.col, gw)
    raw = dense_from(row, col, w)
    deg = raw.sum(axis=0)  # reference degree over col (`src/utils.py:191`)
    expected = raw / np.sqrt(deg)[:, None] / np.sqrt(deg)[None, :]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_spmm_matches_dense():
    g = build.build_graph(EDGE[0], EDGE[1], N, self_loop_weight=1.0,
                          pad_multiple=8)
    y = spmm(g.row, g.col, g.edge_weight, jnp.asarray(X), N)
    expected = np.asarray(g.to_dense()) @ X
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_spmm_padding_is_inert():
    g1 = Graph.from_edges(EDGE[0], EDGE[1], N)
    g2 = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=64)
    y1 = spmm(g1.row, g1.col, g1.edge_weight, jnp.asarray(X), N)
    y2 = spmm(g2.row, g2.col, g2.edge_weight, jnp.asarray(X), N)
    np.testing.assert_allclose(y1, y2, rtol=1e-6)


def test_segment_softmax_sums_to_one():
    g = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=16)
    scores = jnp.asarray(np.random.RandomState(0).randn(16, 4), jnp.float32)
    att = segment_softmax(scores, g.row, N, mask=g.edge_mask)
    # per-segment sums over real edges == 1 for segments that have edges
    sums = jax.ops.segment_sum(att, g.row, num_segments=N)
    for seg in np.unique(EDGE[0]):
        np.testing.assert_allclose(sums[seg], np.ones(4), rtol=1e-5)
    # padded edges got zero probability
    assert float(jnp.abs(att[4:]).max()) == 0.0
    # all values in (0, 1]
    real = att[:4]
    assert float(real.min()) > 0.0 and float(real.max()) <= 1.0 + 1e-6


def test_segment_softmax_uniform_on_equal_scores():
    # node 2 has two outgoing edges (rows [2,2]) → 0.5 each
    g = Graph.from_edges(EDGE[0], EDGE[1], N)
    att = segment_softmax(jnp.ones((4, 1)), g.row, N, mask=g.edge_mask)
    np.testing.assert_allclose(att[1:3], 0.5 * np.ones((2, 1)), rtol=1e-6)


def test_squareplus_sums_to_one():
    g = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=8)
    scores = jnp.asarray(np.random.RandomState(1).randn(8, 2), jnp.float32)
    att = squareplus_norm(scores, g.row, N, mask=g.edge_mask)
    sums = jax.ops.segment_sum(att, g.row, num_segments=N)
    for seg in np.unique(EDGE[0]):
        np.testing.assert_allclose(sums[seg], np.ones(2), rtol=1e-5)


def test_sddmm_dot():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(N, 2, 3), jnp.float32)
    k = jnp.asarray(rng.randn(N, 2, 3), jnp.float32)
    row, col = jnp.asarray(EDGE[0]), jnp.asarray(EDGE[1])
    s = sddmm_dot(row, col, q, k)
    for e in range(4):
        for h in range(2):
            np.testing.assert_allclose(
                s[e, h], np.dot(q[EDGE[0][e], h], k[EDGE[1][e], h]), rtol=1e-5)


def test_multihead_spmm_vs_dense():
    rng = np.random.RandomState(3)
    g = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=8)
    att = jnp.asarray(rng.rand(8, 2), jnp.float32) * g.edge_mask[:, None]
    v = jnp.asarray(rng.randn(N, 2, 3), jnp.float32)
    out = spmm_multihead(g.row, g.col, att, v, N)
    for h in range(2):
        dense = dense_from(np.asarray(g.row), np.asarray(g.col),
                           np.asarray(att[:, h]))
        np.testing.assert_allclose(out[:, h], dense @ np.asarray(v[:, h]),
                                   rtol=1e-5)


def test_build_undirected_and_self_loops():
    row, col = build.to_undirected(EDGE[0], EDGE[1], N)
    d = dense_from(row, col, np.ones(len(row)))
    np.testing.assert_allclose(d, d.T)
    r2, c2, w2 = build.add_self_loops(row, col, None, 0.7, N)
    d2 = dense_from(r2, c2, w2)
    np.testing.assert_allclose(np.diag(d2), 0.7 * np.ones(N))


def test_add_self_loops_accumulates_existing():
    # reference semantics: existing self-loop weight w becomes w + fill
    row = np.array([0, 0]); col = np.array([0, 1])
    r, c, w = build.add_self_loops(row, col, np.array([2.0, 1.0]), 1.0, 2)
    d = dense_from(r, c, w, 2)
    np.testing.assert_allclose(d, np.array([[3.0, 1.0], [0.0, 1.0]]))


def test_vmap_batched_spmm():
    """The reference's [B,2,E] batching maps to vmap over Graph arrays."""
    B = 3
    rng = np.random.RandomState(4)
    xs = jnp.asarray(rng.randn(B, N, 2), jnp.float32)
    g = Graph.from_edges(EDGE[0], EDGE[1], N)
    out = jax.vmap(lambda x: spmm(g.row, g.col, g.edge_weight, x, N))(xs)
    dense = dense_from(EDGE[0], EDGE[1], np.ones(4))
    for b in range(B):
        np.testing.assert_allclose(out[b], dense @ np.asarray(xs[b]), rtol=1e-5)


def test_native_builders_match_numpy():
    """C++ graph builder == NumPy fallback on every op."""
    import os
    from graphax import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    row = rng.randint(0, 50, 300)
    col = rng.randint(0, 50, 300)
    w = rng.rand(300)

    os.environ["GRAPHAX_NO_NATIVE"] = "1"
    try:
        r_np, c_np, w_np = build.coalesce(row, col, w, 50)
        u_np = build.to_undirected(row, col, 50)
    finally:
        del os.environ["GRAPHAX_NO_NATIVE"]

    r_n, c_n, w_n = native.coalesce(row, col, w)
    np.testing.assert_array_equal(r_n, r_np)
    np.testing.assert_array_equal(c_n, c_np)
    np.testing.assert_allclose(w_n, w_np, rtol=1e-12)

    u_n = native.to_undirected(row, col, 50)
    np.testing.assert_array_equal(u_n[0], u_np[0])
    np.testing.assert_array_equal(u_n[1], u_np[1])

    sl_n = native.add_self_loops(r_np, c_np, w_np, 0.7, 50)
    sl_np = build.add_self_loops(r_np, c_np, w_np, 0.7, 50)
    np.testing.assert_array_equal(sl_n[0], sl_np[0])
    np.testing.assert_allclose(sl_n[2], sl_np[2], rtol=1e-12)


def test_native_lcc_matches_scipy():
    from graphax import native
    from graphax.data.lcc import largest_connected_component

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    # two components: 0-9 chain and 10-14 chain
    row = np.r_[np.arange(9), np.arange(10, 14)]
    col = np.r_[np.arange(1, 10), np.arange(11, 15)]
    keep = native.largest_connected_component(row, col, 15)
    np.testing.assert_array_equal(keep, np.arange(10))
    keep2, r2, c2 = largest_connected_component(row, col, 15)
    np.testing.assert_array_equal(keep2, np.arange(10))


def test_native_row_tiles_match():
    import dataclasses
    import os
    from graphax import native
    from graphax.kernels.tiles import build_row_tiles

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(1)
    row = np.sort(rng.randint(0, 300, 900))
    col = rng.randint(0, 300, 900)
    t_native = build_row_tiles(row, col, 300, tile=128, block_edges=64)
    os.environ["GRAPHAX_NO_NATIVE"] = "1"
    try:
        t_numpy = build_row_tiles(row, col, 300, tile=128, block_edges=64)
    finally:
        del os.environ["GRAPHAX_NO_NATIVE"]
    np.testing.assert_array_equal(t_native.tile_idx, t_numpy.tile_idx)
    np.testing.assert_array_equal(t_native.local_row, t_numpy.local_row)
    np.testing.assert_array_equal(t_native.col, t_numpy.col)
    np.testing.assert_array_equal(t_native.slot_mask, t_numpy.slot_mask)


def test_refined_quantile_matches_sort():
    """Histogram-bisection quantile vs the exact sort-based masked_quantile
    (torch.quantile semantics) on random data with padding."""
    import jax.numpy as jnp
    from graphax.blocks.hard_attention import masked_quantile
    from graphax.sparse.quantile import refined_masked_quantile

    rng = np.random.RandomState(0)
    for trial, q in enumerate([0.05, 0.25, 0.5, 0.811, 0.99]):
        vals = rng.rand(5000).astype(np.float32) * rng.choice([1.0, 1e-3])
        mask = rng.rand(5000) < 0.8
        want = float(masked_quantile(jnp.asarray(vals), jnp.asarray(mask), q))
        got = float(refined_masked_quantile(jnp.asarray(vals),
                                            jnp.asarray(mask), q))
        span = vals[mask].max() - vals[mask].min()
        assert abs(got - want) <= span / 1024 ** 2 + 1e-7, (trial, got, want)


def test_refined_quantile_degenerate():
    import jax.numpy as jnp
    from graphax.sparse.quantile import refined_masked_quantile

    vals = jnp.full(100, 0.5, jnp.float32)
    mask = jnp.ones(100, bool)
    got = float(refined_masked_quantile(vals, mask, 0.3))
    assert abs(got - 0.5) < 1e-6


@pytest.mark.slow
def test_distributed_quantile_matches_single():
    """psum'd histogram bisection inside shard_map equals the single-chip
    refined quantile (identical rounds/bins ⇒ identical thresholds)."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from graphax.sparse.quantile import (
        make_distributed_quantile, refined_masked_quantile,
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    qfn = make_distributed_quantile("graph")
    rng = np.random.RandomState(1)
    vals = rng.rand(4, 1000).astype(np.float32)
    mask = rng.rand(4, 1000) < 0.9

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("graph"), P("graph")), out_specs=P())
    def run(v, m):
        return qfn(v[0], m[0], 0.189)[None]

    got = float(np.ravel(np.asarray(run(jnp.asarray(vals),
                                        jnp.asarray(mask))))[0])
    want = float(refined_masked_quantile(
        jnp.asarray(vals.ravel()), jnp.asarray(mask.ravel()), 0.189))
    assert abs(got - want) < 1e-6, (got, want)
