"""Parity tests for the streaming Pallas fused-attention RHS (interpreter
mode on CPU). Pins values against the XLA fused block-layout path AND the
plain edge-space path for every score type × normalization, plus the
custom-vjp gradient replay."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphax.kernels.dispatch import attach_tiles
from graphax.kernels.fused_attention import fused_attention_ax
from graphax.kernels.pallas_attention import fused_attention_ax_pallas
from graphax.functions.transformer import (
    multiply_attention, transformer_attention_apply,
    transformer_attention_init,
)
from graphax.sparse import Graph
from graphax.train import Config


def make_graph(n=29, e=120, seed=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n - 3, e)
    col = rng.randint(0, n - 3, e)
    order = np.lexsort((col, row))
    w = rng.rand(e).astype(np.float32) + 0.2
    g = Graph.from_edges(row[order], col[order], n, edge_weight=w[order])
    g = attach_tiles(g, tile=8, block_edges=16)
    return dataclasses.replace(g, strategy="tiled")


def randomized_params(cfg, in_dim, seed=1):
    p = transformer_attention_init(jax.random.PRNGKey(0), cfg, in_dim)
    rng = np.random.RandomState(seed)
    for name in ("Q", "K"):
        p[name] = {
            "w": jnp.asarray(rng.randn(*p[name]["w"].shape) * 0.3,
                             jnp.float32),
            "b": jnp.asarray(rng.randn(*p[name]["b"].shape) * 0.1,
                             jnp.float32),
        }
    return p


@pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim", "pearson",
                                      "exp_kernel"])
@pytest.mark.parametrize("square_plus", [False, True])
def test_pallas_attention_matches_xla_paths(att_type, square_plus):
    g = make_graph()
    d = 6
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type=att_type,
                 square_plus=square_plus)
    p = randomized_params(cfg, d)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    got = fused_attention_ax_pallas(cfg, p, g.tiles, x,
                                    edge_weight=g.edge_weight)
    want_fused = fused_attention_ax(cfg, p, g.tiles, x,
                                    edge_weight=g.edge_weight)
    att, (v, _) = transformer_attention_apply(p, cfg, g, x)
    want_edge = multiply_attention(p, cfg, g, x, att, v)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want_fused),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_edge),
                               rtol=2e-4, atol=2e-5)


def test_pallas_attention_reweight():
    g = make_graph(seed=3)
    d = 5
    cfg = Config(function="transformer", heads=1, attention_dim=4,
                 hidden_dim=d, attention_type="scaled_dot",
                 reweight_attention=True)
    p = randomized_params(cfg, d, seed=4)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    got = fused_attention_ax_pallas(cfg, p, g.tiles, x,
                                    edge_weight=g.edge_weight)
    want = fused_attention_ax(cfg, p, g.tiles, x, edge_weight=g.edge_weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pallas_attention_gradient_replays_xla():
    g = make_graph(seed=6)
    d = 4
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type="scaled_dot")
    p = randomized_params(cfg, d, seed=7)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    probe = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    def loss_pl(p, x):
        return jnp.sum(fused_attention_ax_pallas(
            cfg, p, g.tiles, x, edge_weight=g.edge_weight) * probe)

    def loss_xla(p, x):
        return jnp.sum(fused_attention_ax(
            cfg, p, g.tiles, x, edge_weight=g.edge_weight) * probe)

    gp = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_eval_forward_routes_fast_attention(monkeypatch):
    """GNN eval forward on the tiled strategy must route the transformer RHS
    through the Pallas kernels and agree with the train-mode (XLA) route."""
    from graphax.kernels import pallas_tiled
    from graphax.blocks.common import make_fstate
    from graphax.functions import get_function
    from graphax.functions.common import prepare_scalars

    monkeypatch.setattr(pallas_tiled, "FORCE", True)
    g = make_graph(seed=9)
    d = 6
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type="scaled_dot", add_source=True)
    f = get_function(cfg, d)
    params = prepare_scalars(f.init(jax.random.PRNGKey(1)), cfg, jnp.float32)
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    fs_eval = make_fstate(g, x, train=False)
    assert fs_eval.fast_attention
    fs_train = make_fstate(g, x, train=True)
    assert not fs_train.fast_attention
    dx_fast = f.rhs(params, fs_eval, 0.0, x)
    dx_ref = f.rhs(params, fs_train, 0.0, x)
    np.testing.assert_allclose(np.asarray(dx_fast), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-5)


def test_flash_fallback_many_heads():
    """H > FLASH_MAX_HEADS must fall back to the 3-kernel path and still
    match the XLA fused path (softmax config that would otherwise flash)."""
    from graphax.kernels.pallas_attention import flash_applicable

    g = make_graph(seed=11)
    d = 8
    cfg = Config(function="transformer", heads=8, attention_dim=16,
                 hidden_dim=d, attention_type="scaled_dot")
    assert not flash_applicable(cfg)
    cfg2 = dataclasses.replace(cfg, heads=2)
    assert flash_applicable(cfg2)
    p = randomized_params(cfg, d, seed=12)
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    got = fused_attention_ax_pallas(cfg, p, g.tiles, x,
                                    edge_weight=g.edge_weight)
    want = fused_attention_ax(cfg, p, g.tiles, x, edge_weight=g.edge_weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pallas_backward_kernels_match_xla():
    """Round 2: the Pallas backward (B1/B2 + transpose-layout col
    reductions) vs the XLA fused path's autodiff, for the supported config
    (scaled_dot, row softmax)."""
    from graphax.kernels.pallas_attention import pallas_bwd_supported

    g = make_graph(seed=16)
    d = 4
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type="scaled_dot")
    assert pallas_bwd_supported(cfg)
    assert g.tiles_t is not None and g.tiles_t.perm_from_row is not None
    p = randomized_params(cfg, d, seed=17)
    rng = np.random.RandomState(18)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    probe = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    def loss_pl(p, x):
        return jnp.sum(fused_attention_ax_pallas(
            cfg, p, g.tiles, x, tiles_t=g.tiles_t) * probe)

    def loss_xla(p, x):
        return jnp.sum(fused_attention_ax(cfg, p, g.tiles, x) * probe)

    # forward parity
    np.testing.assert_allclose(
        np.asarray(fused_attention_ax_pallas(cfg, p, g.tiles, x,
                                             tiles_t=g.tiles_t)),
        np.asarray(fused_attention_ax(cfg, p, g.tiles, x)),
        rtol=1e-4, atol=1e-5)
    # gradient parity (params Q/K w/b + x)
    gp, gx_ = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    wp, wx_ = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_), np.asarray(wx_),
                               rtol=2e-4, atol=2e-5)
    for name in ("Q", "K"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(gp[name][leaf]), np.asarray(wp[name][leaf]),
                rtol=2e-4, atol=2e-5, err_msg=f"{name}/{leaf}")
    # V/Wout untouched by the head-mean RHS -> zero grads both sides
    assert float(jnp.abs(jax.tree_util.tree_leaves(gp["V"])[0]).max()) == 0


def test_train_forward_routes_pallas_when_supported(monkeypatch):
    """make_fstate now enables fast_attention for train=True when the config
    has a Pallas backward."""
    from graphax.kernels import pallas_tiled
    from graphax.blocks.common import make_fstate

    monkeypatch.setattr(pallas_tiled, "FORCE", True)
    g = make_graph(seed=19)
    cfg_ok = Config(function="transformer", heads=2, attention_dim=8,
                    hidden_dim=4, attention_type="scaled_dot")
    cfg_no = cfg_ok.replace(square_plus=True)
    rng = np.random.RandomState(20)
    x = jnp.asarray(rng.randn(g.num_nodes, 4), jnp.float32)
    assert make_fstate(g, x, train=True, cfg=cfg_ok).fast_attention
    assert not make_fstate(g, x, train=True, cfg=cfg_no).fast_attention
    assert make_fstate(g, x, train=False, cfg=cfg_no).fast_attention


@pytest.mark.parametrize("adjoint", [False, True])
def test_grand_nl_trains_through_pallas(monkeypatch, adjoint):
    """End to end: GRAND-nl training steps (dopri5; direct and adjoint
    grads) with the per-NFE attention RHS routed through the Pallas
    fwd+bwd kernels — losses finite and decreasing, matching the XLA route."""
    from graphax.kernels import pallas_tiled
    from graphax.data import make_sbm_dataset
    from graphax.train.loop import Trainer

    data = make_sbm_dataset(num_nodes=48, num_classes=3, num_features=8,
                            p_in=0.2, p_out=0.02, feature_noise=2.0, seed=0)
    g = attach_tiles(data.graph, tile=8, block_edges=16)
    data = dataclasses.replace(
        data, graph=dataclasses.replace(g, strategy="tiled"))
    cfg = Config(function="transformer", block="constant", hidden_dim=8,
                 heads=2, attention_dim=8, attention_type="scaled_dot",
                 method="dopri5", time=1.0, tol_scale=100.0, max_nfe=200,
                 add_source=True, input_dropout=0.0, dropout=0.0, lr=0.03,
                 no_early=True, adjoint=adjoint,
                 adjoint_method="adaptive_heun", tol_scale_adjoint=100.0)

    def run(force):
        monkeypatch.setattr(pallas_tiled, "FORCE", force)
        tr = Trainer(cfg, data, jit=True)
        st = tr.init_state(seed=0)
        losses = []
        for _ in range(3):
            st, loss = tr.train_step(st)
            losses.append(loss)
        return losses

    l_pl = run(True)
    l_xla = run(False)
    assert all(np.isfinite(l_pl))
    assert l_pl[-1] < l_pl[0]
    np.testing.assert_allclose(l_pl, l_xla, rtol=2e-3, atol=2e-4)
