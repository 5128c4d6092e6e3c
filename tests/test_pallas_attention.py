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


@pytest.mark.slow
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


def test_flash_many_heads_and_vmem_fallback():
    """Round 2 lift: H=8 now rides the flash kernel (the old H<=4 cap was
    replaced by a VMEM estimate); an accumulator footprint past the budget
    falls back to the 3-kernel path. Both must match the XLA fused path."""
    from graphax.kernels.pallas_attention import flash_applicable

    g = make_graph(seed=11)
    d = 8
    cfg = Config(function="transformer", heads=8, attention_dim=16,
                 hidden_dim=d, attention_type="scaled_dot")
    assert flash_applicable(cfg, d=d)            # 8 heads: in budget
    assert not flash_applicable(cfg, d=4096)     # acc would blow VMEM
    assert not flash_applicable(
        dataclasses.replace(cfg, attention_norm_idx=1), d=d)
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
@pytest.mark.slow
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


# ----------------------------------------------------------------------
# round 2 (VERDICT #6): fast-path coverage of the tuned configs
# ----------------------------------------------------------------------

def _edge_space_oracle(cfg, p, g, x):
    att, (v, _) = transformer_attention_apply(p, cfg, g, x)
    return multiply_attention(p, cfg, g, x, att, v)


@pytest.mark.parametrize("square_plus", [False, True])
def test_fused_norm_idx1_matches_edge_space(square_plus):
    """Col-normalized softmax/squareplus (the Cora/Citeseer/CoauthorCS
    tuned shape: heads=8, norm_idx=1 — `src/best_params.py:1-2,4`) on the
    XLA fused block path via the transpose layout."""
    from graphax.kernels.fused_attention import fused_path_applicable

    g = make_graph(seed=21)
    d = 6
    cfg = Config(function="transformer", heads=8, attention_dim=16,
                 hidden_dim=d, attention_type="scaled_dot",
                 attention_norm_idx=1, square_plus=square_plus)
    assert not fused_path_applicable(cfg, None)
    assert fused_path_applicable(cfg, g.tiles_t)
    p = randomized_params(cfg, d, seed=22)
    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    want = _edge_space_oracle(cfg, p, g, x)
    got = fused_attention_ax(cfg, p, g.tiles, x, edge_weight=g.edge_weight,
                             tiles_t=g.tiles_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("square_plus", [False, True])
def test_pallas_norm_idx1_matches_edge_space(square_plus):
    """Same configs through the streaming Pallas path (per-edge-denominator
    K3 + transpose-layout col reduce)."""
    g = make_graph(seed=31)
    d = 6
    cfg = Config(function="transformer", heads=4, attention_dim=8,
                 hidden_dim=d, attention_type="scaled_dot",
                 attention_norm_idx=1, square_plus=square_plus)
    p = randomized_params(cfg, d, seed=32)
    rng = np.random.RandomState(33)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    want = _edge_space_oracle(cfg, p, g, x)
    got = fused_attention_ax_pallas(cfg, p, g.tiles, x,
                                    edge_weight=g.edge_weight,
                                    tiles_t=g.tiles_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_pallas_norm_idx1_gradients_replay():
    """Gradients through the norm_idx=1 Pallas forward (XLA-replay vjp with
    the transpose tables) vs direct autodiff of the edge-space path."""
    g = make_graph(seed=41)
    d = 5
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type="scaled_dot",
                 attention_norm_idx=1)
    p = randomized_params(cfg, d, seed=42)
    rng = np.random.RandomState(43)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    def loss_pallas(params, xx):
        out = fused_attention_ax_pallas(cfg, params, g.tiles, xx,
                                        edge_weight=g.edge_weight,
                                        tiles_t=g.tiles_t)
        return jnp.sum(out ** 2)

    def loss_ref(params, xx):
        return jnp.sum(_edge_space_oracle(cfg, params, g, xx) ** 2)

    gp, gx = jax.grad(loss_pallas, argnums=(0, 1))(p, x)
    rp, rx = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=5e-4, atol=5e-5)
    for name in ("Q", "K"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(np.asarray(gp[name][leaf]),
                                       np.asarray(rp[name][leaf]),
                                       rtol=5e-4, atol=5e-5)


def _beltrami_cfg(d, fh=4, ph=3, heads=2):
    return Config(function="transformer", heads=heads, attention_dim=8,
                  hidden_dim=d, attention_type="exp_kernel", beltrami=True,
                  feat_hidden_dim=fh, pos_enc_hidden_dim=ph,
                  pos_enc_dim=ph)


def _beltrami_params(cfg, in_dim, seed):
    p = transformer_attention_init(jax.random.PRNGKey(0), cfg, in_dim)
    rng = np.random.RandomState(seed)
    for name in ("Qx", "Kx", "Qp", "Kp"):
        p[name] = {
            "w": jnp.asarray(rng.randn(*p[name]["w"].shape) * 0.4,
                             jnp.float32),
            "b": jnp.asarray(rng.randn(*p[name]["b"].shape) * 0.1,
                             jnp.float32),
        }
    p["output_var_x"] = jnp.asarray(1.2)
    p["lengthscale_x"] = jnp.asarray(0.8)
    p["output_var_p"] = jnp.asarray(0.9)
    p["lengthscale_p"] = jnp.asarray(1.1)
    return p


def test_fused_beltrami_matches_edge_space():
    """Beltrami product-of-Gaussians scores on the XLA fused block path
    (state layout [features | positional | labels])."""
    from graphax.kernels.fused_attention import fused_path_applicable

    g = make_graph(seed=51)
    d = 4 + 3 + 2  # fh + ph + label columns
    cfg = _beltrami_cfg(d)
    assert fused_path_applicable(cfg, g.tiles_t)
    p = _beltrami_params(cfg, d, seed=52)
    rng = np.random.RandomState(53)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    want = _edge_space_oracle(cfg, p, g, x)
    got = fused_attention_ax(cfg, p, g.tiles, x, edge_weight=g.edge_weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("flash", [False, True])
def test_pallas_beltrami_matches_edge_space(flash):
    """Beltrami scores through the streaming Pallas kernels (combined
    [D, 2A] K-weight trick), 3-kernel and single-pass flash variants."""
    from graphax.kernels import pallas_attention as pa

    g = make_graph(seed=61)
    d = 4 + 3 + 2
    cfg = _beltrami_cfg(d)
    p = _beltrami_params(cfg, d, seed=62)
    rng = np.random.RandomState(63)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    want = _edge_space_oracle(cfg, p, g, x)
    if flash:
        got = fused_attention_ax_pallas(cfg, p, g.tiles, x,
                                        edge_weight=g.edge_weight)
    else:
        f = pa._make_fused(cfg, g.tiles.num_tiles, g.tiles.tile,
                           g.tiles.block_edges, g.tiles.num_nodes)
        ew = jnp.zeros(g.tiles.edge_slot.reshape(-1).shape, jnp.float32)
        # residual (non-flash) route: ask for residuals via grad (replay)
        got = f(p, x, x, ew, g.tiles.edge_slot, g.tiles.slot_mask,
                g.tiles.col, g.tiles.local_row, g.tiles.tile_idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_flash_squareplus_two_pass():
    """Squareplus flash (global shift precomputed by the max-only kernel)
    matches the 3-kernel path and the edge-space oracle."""
    g = make_graph(seed=71)
    d = 6
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type="scaled_dot",
                 square_plus=True)
    p = randomized_params(cfg, d, seed=72)
    rng = np.random.RandomState(73)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    want = _edge_space_oracle(cfg, p, g, x)
    got = fused_attention_ax_pallas(cfg, p, g.tiles, x,
                                    edge_weight=g.edge_weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim",
                                      "exp_kernel"])
@pytest.mark.parametrize("reweight", [False, True])
def test_attention_edge_means_matches_apply(att_type, reweight):
    """The block-level pin entry (attention_edge_means_pallas) must equal
    the per-edge XLA apply's head-mean for every covered score type."""
    from graphax.kernels.pallas_attention import (
        attention_edge_means_pallas, attention_means_supported,
    )

    g = make_graph()
    d = 6
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type=att_type,
                 reweight_attention=reweight)
    assert attention_means_supported(cfg)
    p = randomized_params(cfg, d)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    got = attention_edge_means_pallas(cfg, p, g.tiles, x,
                                      int(g.edge_buffer_size),
                                      edge_weight=g.edge_weight)
    att, _ = transformer_attention_apply(p, cfg, g, x)
    want = np.asarray(att.mean(axis=1)) * np.asarray(g.edge_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_attention_edge_means_two_input_form():
    """Sharded pin form: keys gathered from a separate (extended) source
    array; cols index x_src."""
    from graphax.kernels.pallas_attention import attention_edge_means_pallas

    g = make_graph()
    d = 6
    cfg = Config(function="transformer", heads=2, attention_dim=8,
                 hidden_dim=d, attention_type="scaled_dot")
    p = randomized_params(cfg, d)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    got = attention_edge_means_pallas(cfg, p, g.tiles, x,
                                      int(g.edge_buffer_size),
                                      edge_weight=g.edge_weight, x_src=x)
    att, _ = transformer_attention_apply(p, cfg, g, x)
    want = np.asarray(att.mean(axis=1)) * np.asarray(g.edge_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_pallas_backward_wide_attention_dim():
    """attention_dim > 64 routes B3's node-table pack through the split
    branch (separate bf16 q̃ gather + packed narrow tables); gradients must
    still replay the XLA path."""
    from graphax.kernels.pallas_attention import pallas_bwd_supported

    g = make_graph(seed=26)
    d = 6
    cfg = Config(function="transformer", heads=2, attention_dim=128,
                 hidden_dim=d, attention_type="scaled_dot")
    assert pallas_bwd_supported(cfg)
    p = randomized_params(cfg, d, seed=27)
    rng = np.random.RandomState(28)
    x = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)
    probe = jnp.asarray(rng.randn(g.num_nodes, d), jnp.float32)

    def loss_pl(p, x):
        return jnp.sum(fused_attention_ax_pallas(
            cfg, p, g.tiles, x, tiles_t=g.tiles_t) * probe)

    def loss_xla(p, x):
        return jnp.sum(fused_attention_ax(cfg, p, g.tiles, x) * probe)

    gp, gxx = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    wp, wxx = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gxx), np.asarray(wxx),
                               rtol=2e-4, atol=2e-5)
    for name in ("Q", "K"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(gp[name][leaf]), np.asarray(wp[name][leaf]),
                rtol=2e-4, atol=2e-5)
