"""Per-step diffusion parity vs an independent torch implementation of the
reference's math (BASELINE.md: "Per-step diffusion parity: allclose vs
reference RHS outputs on fixed fixtures").

The reference stack (torch_geometric / torch_scatter) is not installed
here, so the oracle re-implements the reference's formulas directly in
plain torch following `src/utils.py`, `src/function_laplacian_diffusion.py`
and `src/function_transformer_attention.py` — scatter ops via
index_add_, densified checks via dense matmul — and graphax must match to
float32 tolerance on the same fixtures."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from graphax import Config
from graphax.blocks.common import normalize_graph
from graphax.functions import get_function, transformer_attention_apply
from graphax.functions.common import FuncState
from graphax.sparse import Graph, build


# ----------------------------------------------------------------------
# torch oracle (independent implementation of the reference math)
# ----------------------------------------------------------------------

def torch_scatter_add(src, index, dim_size):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, index, src)


def torch_rw_norm(row, col, w, n, norm_dim=1):
    # get_rw_adj: deg over the norm_dim endpoint, weights / deg
    idx = row if norm_dim == 0 else col
    deg = torch_scatter_add(w, idx, n)
    deg_inv = torch.where(deg > 0, 1.0 / deg, torch.zeros_like(deg))
    return w * deg_inv[idx]


def torch_segment_softmax(scores, index, n):
    # src/utils.py:116-127: per-segment max shift, +1e-16 denominator
    smax = torch.full((n,) + scores.shape[1:], -1e30)
    smax = smax.index_reduce_(0, index, scores, "amax", include_self=True)
    smax = torch.where(smax <= -1e29, torch.zeros_like(smax), smax)
    e = torch.exp(scores - smax[index])
    denom = torch_scatter_add(e, index, n)
    return e / (denom[index] + 1e-16)


def torch_laplacian_rhs(row, col, w, x, x0, n, alpha_raw=0.0, beta_raw=0.0,
                        add_source=False):
    # f = sigmoid(alpha)*(Ax - x) [+ beta*x0]
    ax = torch_scatter_add(x[col] * w[:, None], row, n)
    alpha = torch.sigmoid(torch.tensor(alpha_raw))
    f = alpha * (ax - x)
    if add_source:
        f = f + beta_raw * x0
    return f


def torch_transformer_rhs(row, col, x, x0, n, qw, qb, kw, kb, heads,
                          alpha_raw=0.0):
    # scaled-dot per-edge scores, row softmax, head-mean SpMM on x
    q = (x @ qw + qb).reshape(n, heads, -1)
    k = (x @ kw + kb).reshape(n, heads, -1)
    d_k = q.shape[-1]
    scores = (q[row] * (k[col] / d_k ** 0.5)).sum(-1)       # [E, H]
    att = torch_segment_softmax(scores, row, n)
    mean_att = att.mean(dim=1)
    ax = torch_scatter_add(x[col] * mean_att[:, None], row, n)
    alpha = torch.sigmoid(torch.tensor(alpha_raw))
    return alpha * (ax - x), att


# ----------------------------------------------------------------------
# fixtures
# ----------------------------------------------------------------------

def fixture_graph(n=80, e=400, seed=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    keep = row != col
    r, c, w = build.add_self_loops(*build.to_undirected(row[keep],
                                                        col[keep], n),
                                   None, 1.0, n)
    return r, c, w, n


@pytest.mark.parametrize("strategy", ["edge", "dense"])
def test_laplacian_rhs_matches_torch(strategy):
    import dataclasses

    r, c, w, n = fixture_graph(seed=1)
    cfg = Config(hidden_dim=8, function="laplacian", self_loop_weight=1.0,
                 add_source=True, data_norm="rw")
    g0 = dataclasses.replace(
        Graph.from_edges(r, c, n, w, edge_buffer_size=len(r) + 32),
        strategy=strategy)
    g = normalize_graph(cfg, g0)

    rng = np.random.RandomState(2)
    x = rng.randn(n, 8).astype(np.float32)
    x0 = rng.randn(n, 8).astype(np.float32)

    # torch oracle: rw norm + the fork's second self-loop add
    tr = torch.tensor(r)
    tc = torch.tensor(c)
    tw = torch.tensor(np.asarray(w, np.float32))
    w_norm = torch_rw_norm(tr, tc, tw, n, norm_dim=1)
    w_norm = w_norm + torch.where(tr == tc, torch.ones(len(r)),
                                  torch.zeros(len(r)))  # self_loop_weight=1
    beta = 0.0
    want = torch_laplacian_rhs(tr, tc, w_norm, torch.tensor(x),
                               torch.tensor(x0), n, alpha_raw=0.0,
                               beta_raw=beta, add_source=True)

    func = get_function(cfg, 8)
    params = func.init(jax.random.PRNGKey(0))
    from graphax.blocks.common import make_fstate

    fstate = make_fstate(g, jnp.asarray(x0))
    got = func.rhs(params, fstate, 0.0, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5,
                               atol=2e-5)


def test_transformer_attention_matches_torch():
    r, c, w, n = fixture_graph(seed=3)
    cfg = Config(hidden_dim=8, function="transformer", heads=2,
                 attention_dim=16, attention_type="scaled_dot",
                 attention_norm_idx=0, self_loop_weight=1.0)
    g = Graph.from_edges(r, c, n, w, edge_buffer_size=len(r) + 16)

    func = get_function(cfg, 8)
    params = func.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    params["att"]["Q"]["w"] = 0.4 * jax.random.normal(key, (8, 16))
    params["att"]["K"]["w"] = 0.4 * jax.random.normal(
        jax.random.fold_in(key, 1), (8, 16))

    rng = np.random.RandomState(4)
    x = rng.randn(n, 8).astype(np.float32)

    att_jax, _ = transformer_attention_apply(params["att"], cfg, g,
                                             jnp.asarray(x))
    dx_jax = func.rhs(params, FuncState(graph=g, x0=jnp.asarray(x)), 0.0,
                      jnp.asarray(x))

    qw = torch.tensor(np.asarray(params["att"]["Q"]["w"], np.float32))
    qb = torch.tensor(np.asarray(params["att"]["Q"]["b"], np.float32))
    kw = torch.tensor(np.asarray(params["att"]["K"]["w"], np.float32))
    kb = torch.tensor(np.asarray(params["att"]["K"]["b"], np.float32))
    want_dx, want_att = torch_transformer_rhs(
        torch.tensor(r), torch.tensor(c), torch.tensor(x), torch.tensor(x),
        n, qw, qb, kw, kb, heads=2)

    e_real = len(r)
    np.testing.assert_allclose(np.asarray(att_jax)[:e_real],
                               want_att.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_jax), want_dx.numpy(),
                               rtol=2e-4, atol=1e-5)


def test_segment_softmax_matches_torch():
    r, c, w, n = fixture_graph(seed=5)
    g = Graph.from_edges(r, c, n, w)
    rng = np.random.RandomState(6)
    scores = rng.randn(len(r), 3).astype(np.float32)

    from graphax.sparse.ops import segment_softmax

    got = segment_softmax(jnp.asarray(scores), g.row, n, mask=g.edge_mask)
    want = torch_segment_softmax(torch.tensor(scores), torch.tensor(r), n)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_euler_step_trajectory_matches_torch():
    """Three explicit-Euler steps of GRAND-l: the whole discrete trajectory
    matches the torch oracle step-for-step."""
    r, c, w, n = fixture_graph(seed=7)
    cfg = Config(hidden_dim=4, function="laplacian", self_loop_weight=1.0,
                 method="euler", step_size=0.5, time=1.5)
    g_raw = Graph.from_edges(r, c, n, w)
    g = normalize_graph(cfg, g_raw)  # for the torch-side weights only

    rng = np.random.RandomState(8)
    x = rng.randn(n, 4).astype(np.float32)

    func = get_function(cfg, 4)
    params = func.init(jax.random.PRNGKey(0))
    from graphax.blocks import get_block

    blk = get_block(cfg.replace(block="constant"), 4)
    bparams = blk.init(jax.random.PRNGKey(0))
    out = blk.forward(bparams, g_raw, jnp.asarray(x), train=False)

    tw = torch.tensor(np.asarray(g.edge_weight[:len(r)], np.float32))
    tw = tw  # already normalized (incl. double self-loop) by normalize_graph
    tx = torch.tensor(x)
    x0 = tx.clone()
    for _ in range(3):
        f = torch_laplacian_rhs(torch.tensor(r), torch.tensor(c), tw, tx,
                                x0, n)
        tx = tx + 0.5 * f
    np.testing.assert_allclose(np.asarray(out.z), tx.numpy(), rtol=2e-4,
                               atol=1e-5)
