"""Parity tests for the windowed (block-dense) transformer-attention RHS
(`graphax.kernels.windowed_attention`) against the canonical edge-space
path, on community-structured and adversarial uniform-random graphs, for
all four score types, softmax and squareplus, values and gradients, plus
the end-to-end RHS routing through a windowed Graph."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphax.kernels import pallas_tiled, pallas_windows
from graphax.kernels.windowed_attention import (
    windowed_att_applicable, windowed_attention_ax,
)
from graphax.train.config import Config
from graphax.functions.common import FuncState
from graphax.functions.transformer import (
    make_transformer, multiply_attention, transformer_attention_apply,
    transformer_attention_init,
)

from test_pallas_windows import clustered_graph, random_graph


@pytest.fixture(autouse=True)
def _force_windowed(monkeypatch):
    monkeypatch.setattr(pallas_windows, "FORCE", True)
    monkeypatch.setattr(pallas_tiled, "FORCE", True)


def _cfg(**kw):
    base = dict(function="transformer", heads=2, attention_dim=8,
                hidden_dim=6, attention_type="scaled_dot",
                self_loop_weight=0.0, no_early=True)
    base.update(kw)
    return Config(**base)


def _params(cfg, d, seed=0, spread=True):
    p = transformer_attention_init(jax.random.PRNGKey(seed), cfg, d)
    if spread:
        # constant-1e-5 init gives uniform attention — randomize so the
        # comparison actually exercises the softmax
        keys = jax.random.split(jax.random.PRNGKey(seed + 1), 8)
        for i, name in enumerate(("Q", "K", "V")):
            p[name] = {"w": jax.random.normal(keys[i], p[name]["w"].shape),
                       "b": 0.1 * jax.random.normal(keys[4 + i],
                                                    p[name]["b"].shape)}
    return p


def _edge_ax(cfg, p, g, x):
    g_edge = dataclasses.replace(g, tiles=None, tiles_t=None, windows=None,
                                 strategy="edge")
    att, (v, _) = transformer_attention_apply(p, cfg, g_edge, x)
    return multiply_attention(p, cfg, g_edge, x, att, v)


@pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim", "pearson",
                                      "exp_kernel"])
@pytest.mark.parametrize("square_plus", [False, True])
@pytest.mark.slow
def test_windowed_attention_matches_edge_path(att_type, square_plus):
    cfg = _cfg(attention_type=att_type, square_plus=square_plus)
    g = clustered_graph()
    d = 6
    x = jnp.asarray(np.random.RandomState(3).randn(g.num_nodes, d),
                    jnp.float32)
    p = _params(cfg, d)
    got = windowed_attention_ax(cfg, p, g, x)
    want = _edge_ax(cfg, p, g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_windowed_attention_random_graph_and_ragged_nodes():
    # uniform-random graph (worst case: most edges in the residual) with a
    # node count that is not a multiple of the tile
    cfg = _cfg()
    g = random_graph(n=61, e=400, seed=7)
    x = jnp.asarray(np.random.RandomState(4).randn(61, 6), jnp.float32)
    p = _params(cfg, 6, seed=2)
    got = windowed_attention_ax(cfg, p, g, x)
    want = _edge_ax(cfg, p, g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_windowed_attention_reweight():
    cfg = _cfg(reweight_attention=True)
    g = clustered_graph(seed=5)
    x = jnp.asarray(np.random.RandomState(6).randn(g.num_nodes, 6),
                    jnp.float32)
    p = _params(cfg, 6, seed=3)
    from graphax.kernels.pallas_windows import densify_windows
    from graphax.kernels.windows import blocked_window_values

    win, _, _ = blocked_window_values(g.edge_weight, g.windows)
    dense_w = densify_windows(win, g.windows)
    got = windowed_attention_ax(cfg, p, g, x, dense_weight=dense_w)
    want = _edge_ax(cfg, p, g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_windowed_attention_gradients_match():
    cfg = _cfg()
    g = clustered_graph(seed=1)
    x = jnp.asarray(np.random.RandomState(5).randn(g.num_nodes, 6),
                    jnp.float32)
    p = _params(cfg, 6, seed=1)

    def f_win(p, x):
        return jnp.sum(windowed_attention_ax(cfg, p, g, x) ** 2)

    def f_edge(p, x):
        return jnp.sum(_edge_ax(cfg, p, g, x) ** 2)

    gp_w, gx_w = jax.grad(f_win, argnums=(0, 1))(p, x)
    gp_e, gx_e = jax.grad(f_edge, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_e),
                               rtol=5e-4, atol=5e-5)
    for name in ("Q", "K"):
        np.testing.assert_allclose(np.asarray(gp_w[name]["w"]),
                                   np.asarray(gp_e[name]["w"]),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim", "pearson",
                                      "exp_kernel"])
@pytest.mark.slow
def test_pallas_winatt_matches_edge_path(att_type):
    from graphax.kernels.pallas_winatt import windowed_attention_ax_pallas

    cfg = _cfg(attention_type=att_type)
    g = clustered_graph(seed=3)
    x = jnp.asarray(np.random.RandomState(9).randn(g.num_nodes, 6),
                    jnp.float32)
    p = _params(cfg, 6, seed=5)
    got = windowed_attention_ax_pallas(cfg, p, g, x)
    want = _edge_ax(cfg, p, g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_pallas_winatt_reweight_and_grads():
    from graphax.kernels.pallas_winatt import windowed_attention_ax_pallas
    from graphax.kernels.pallas_windows import densify_windows
    from graphax.kernels.windows import blocked_window_values

    cfg = _cfg(reweight_attention=True)
    g = clustered_graph(seed=6)
    x = jnp.asarray(np.random.RandomState(10).randn(g.num_nodes, 6),
                    jnp.float32)
    p = _params(cfg, 6, seed=6)
    win, _, _ = blocked_window_values(g.edge_weight, g.windows)
    dense_w = densify_windows(win, g.windows)

    def f_pal(p, x):
        return jnp.sum(windowed_attention_ax_pallas(
            cfg, p, g, x, dense_weight=dense_w) ** 2)

    def f_edge(p, x):
        return jnp.sum(_edge_ax(cfg, p, g, x) ** 2)

    np.testing.assert_allclose(float(f_pal(p, x)), float(f_edge(p, x)),
                               rtol=2e-4)
    gp_p, gx_p = jax.grad(f_pal, argnums=(0, 1))(p, x)
    gp_e, gx_e = jax.grad(f_edge, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_e),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gp_p["Q"]["w"]),
                               np.asarray(gp_e["Q"]["w"]),
                               rtol=5e-4, atol=5e-5)


def test_rhs_routes_through_windowed_attention(monkeypatch):
    # the transformer RHS on a windowed graph takes the windowed branch and
    # matches the edge-strategy RHS
    cfg = _cfg(add_source=False)
    g = clustered_graph(seed=2)
    d = 6
    x = jnp.asarray(np.random.RandomState(8).randn(g.num_nodes, d),
                    jnp.float32)
    func = make_transformer(cfg, d)
    params = func.init(jax.random.PRNGKey(0))
    params["att"] = _params(cfg, d, seed=4)
    from graphax.blocks.common import make_fstate
    from graphax.functions.common import prepare_scalars

    p = prepare_scalars(params, cfg, x.dtype)
    assert windowed_att_applicable(cfg, g)

    calls = {"n": 0}
    import graphax.kernels.windowed_attention as wa
    real = wa.windowed_attention_ax

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(wa, "windowed_attention_ax", spy)
    fs_win = make_fstate(g, x, train=False)
    got = func.rhs(p, fs_win, 0.0, x)
    assert calls["n"] == 1

    g_edge = dataclasses.replace(g, tiles=None, tiles_t=None, windows=None,
                                 strategy="edge")
    fs_edge = FuncState(graph=g_edge, x0=x)
    want = func.rhs(p, fs_edge, 0.0, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("square_plus", [False, True])
def test_windowed_beltrami_matches_edge_path(square_plus):
    """Round 2: Beltrami product-of-Gaussians scores on the windowed XLA
    path (dense per-head kernels over the concatenated feat|pos
    projections + residual via the fused block scores) vs the edge-space
    oracle."""
    d = 4 + 3 + 2  # fh + ph + label cols
    cfg = _cfg(attention_type="exp_kernel", beltrami=True,
               feat_hidden_dim=4, pos_enc_hidden_dim=3, pos_enc_dim=3,
               hidden_dim=d, square_plus=square_plus)
    g = clustered_graph()
    rng = np.random.RandomState(17)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    p = transformer_attention_init(jax.random.PRNGKey(0), cfg, d)
    keys = jax.random.split(jax.random.PRNGKey(18), 8)
    for i, name in enumerate(("Qx", "Kx", "Qp", "Kp")):
        p[name] = {"w": 0.5 * jax.random.normal(keys[i], p[name]["w"].shape),
                   "b": 0.1 * jax.random.normal(keys[4 + i],
                                                p[name]["b"].shape)}
    p["output_var_x"] = jnp.asarray(1.2)
    p["lengthscale_x"] = jnp.asarray(0.8)
    p["output_var_p"] = jnp.asarray(0.9)
    p["lengthscale_p"] = jnp.asarray(1.1)

    assert windowed_att_applicable(cfg, g)
    got = windowed_attention_ax(cfg, p, g, x)
    want = _edge_ax(cfg, p, g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)
