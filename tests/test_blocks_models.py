"""Block and model level tests on synthetic Cora-shaped data, mirroring
`test/test_gnn.py`, `test/test_block_mixed.py`, `test/test_attention_ode_block.py`,
`test/test_early_stop.py`: forward shape invariance in train/eval, mixed-
attention formula, hard-attention retention, laplacian RHS vs dense numpy
oracle, end-to-end gradient flow, early-stop observer wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax import Config
from graphax.blocks import get_block, normalize_graph
from graphax.functions import get_function
from graphax.functions.common import FuncState
from graphax.models import make_gnn, evaluate_early_stop, make_cgnn
from graphax.models.cgnn import normalize_for_cgnn
from graphax.sparse import Graph, build

EDGE = np.array([[0, 2, 2, 1], [1, 0, 1, 2]])
X = jnp.asarray([[1., 2.], [3., 2.], [4., 5.]])
N = 3


def synthetic_graph(n=40, avg_deg=4, num_feat=8, num_classes=3, seed=0,
                    self_loop=1.0):
    rng = np.random.RandomState(seed)
    e = n * avg_deg
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    keep = row != col
    g = build.build_graph(row[keep], col[keep], n, make_undirected=True,
                          self_loop_weight=self_loop, pad_multiple=64)
    x = jnp.asarray(rng.randn(n, num_feat), jnp.float32)
    y = jnp.asarray(rng.randint(0, num_classes, n))
    return g, x, y


def test_laplacian_rhs_vs_dense_oracle():
    """f = σ(0)·(Ax − x) with the rw-normalized (double-self-loop) operator,
    against a dense numpy computation."""
    cfg = Config(hidden_dim=2, block="constant", function="laplacian",
                 self_loop_weight=1.0, add_source=False)
    g0 = build.build_graph(EDGE[0], EDGE[1], N, self_loop_weight=1.0,
                           pad_multiple=8)
    g = normalize_graph(cfg, g0)
    func = get_function(cfg, 2)
    params = func.init(jax.random.PRNGKey(0))
    fstate = FuncState(graph=g, x0=X)
    dx = func.rhs(params, fstate, 0.0, X)

    dense = np.asarray(g.to_dense())
    expected = 0.5 * (dense @ np.asarray(X) - np.asarray(X))  # σ(0)=0.5
    np.testing.assert_allclose(dx, expected, rtol=1e-5)


def test_add_source_term():
    cfg = Config(hidden_dim=2, add_source=True, self_loop_weight=1.0)
    g = normalize_graph(cfg, build.build_graph(EDGE[0], EDGE[1], N,
                                               self_loop_weight=1.0))
    func = get_function(cfg, 2)
    params = func.init(jax.random.PRNGKey(0))
    params["beta_train"] = jnp.asarray(2.0)
    x0 = jnp.ones((N, 2))
    dx = func.rhs(params, FuncState(graph=g, x0=x0), 0.0, X)
    dx_nosrc = func.rhs({**params, "beta_train": jnp.asarray(0.0)},
                        FuncState(graph=g, x0=x0), 0.0, X)
    np.testing.assert_allclose(dx - dx_nosrc, 2.0 * np.ones((N, 2)), rtol=1e-5)


@pytest.mark.parametrize("block", ["constant", "attention", "mixed",
                                   "hard_attention"])
def test_blocks_shape_invariance(block):
    cfg = Config(hidden_dim=8, block=block, function="laplacian",
                 method="euler", step_size=0.5, time=1.0, heads=2,
                 attention_dim=8, self_loop_weight=1.0, att_samp_pct=0.8)
    g, x, _ = synthetic_graph(num_feat=8)
    blk = get_block(cfg, 8)
    params = blk.init(jax.random.PRNGKey(0))
    for train in (True, False):
        out = blk.forward(params, g, x, train=train)
        assert out.z.shape == x.shape
        assert np.isfinite(np.asarray(out.z)).all()


def test_mixed_attention_formula():
    """mixed == (1−σ(γ))·mean-head attention + σ(γ)·rw weights
    (`test/test_block_mixed.py:67-82`); γ init 0."""
    cfg = Config(hidden_dim=2, block="mixed", function="laplacian",
                 heads=1, attention_dim=2, self_loop_weight=1.0,
                 method="euler", step_size=1.0)
    g0 = build.build_graph(EDGE[0], EDGE[1], N, self_loop_weight=1.0,
                           pad_multiple=8)
    blk = get_block(cfg, 2)
    params = blk.init(jax.random.PRNGKey(0))
    assert float(params["gamma"]) == 0.0
    g = normalize_graph(cfg, g0)
    from graphax.functions import transformer_attention_apply
    att, _ = transformer_attention_apply(params["att_layer"], cfg, g, X)
    mixed = blk.forward.mixed_attention(params, g, X)
    gamma = jax.nn.sigmoid(params["gamma"])
    expected = att.mean(axis=1) * (1 - gamma) + g.edge_weight * gamma
    np.testing.assert_allclose(mixed, expected, rtol=1e-5)


def test_hard_attention_drops_edges():
    cfg = Config(hidden_dim=8, block="hard_attention", function="laplacian",
                 heads=2, attention_dim=8, att_samp_pct=0.5,
                 method="euler", step_size=0.5, self_loop_weight=1.0)
    g, x, _ = synthetic_graph(num_feat=8, seed=3)
    blk = get_block(cfg, 8)
    params = blk.init(jax.random.PRNGKey(1))
    gn = normalize_graph(cfg, g)
    att = blk.forward.attention_weights(params, gn, x)
    # run the train forward — internally keeps ~50% of edges
    out = blk.forward(params, g, x, train=True)
    assert np.isfinite(np.asarray(out.z)).all()


@pytest.mark.parametrize("function", ["laplacian", "transformer", "GAT"])
def test_gnn_forward_shapes(function):
    """End-to-end forward: logits [N, C], train and eval modes
    (`test/test_gnn.py:46-77`)."""
    cfg = Config(hidden_dim=8, block="attention" if function == "laplacian"
                 else "constant", function=function, heads=2,
                 attention_dim=8, method="euler", step_size=0.5, time=1.0,
                 self_loop_weight=1.0, input_dropout=0.2, dropout=0.2)
    g, x, y = synthetic_graph(num_feat=8)
    model = make_gnn(cfg, num_features=8, num_classes=3)
    params, state = model.init(jax.random.PRNGKey(0))
    logits, _, aux = model.apply(params, state, g, x, train=True,
                                 rng=jax.random.PRNGKey(1))
    assert logits.shape == (40, 3)
    logits_eval, _, _ = model.apply(params, state, g, x, train=False)
    assert logits_eval.shape == (40, 3)
    assert np.isfinite(np.asarray(logits_eval)).all()
    assert int(aux["nfe"]) > 0


def test_gnn_options_stack():
    """use_mlp + fc_out + batch_norm + augment + use_labels together."""
    num_classes = 3
    cfg = Config(hidden_dim=8, use_mlp=True, fc_out=True, batch_norm=True,
                 augment=True, use_labels=True, method="euler",
                 step_size=0.5, self_loop_weight=1.0)
    g, x, y = synthetic_graph(num_feat=8)
    # label trick: input features widened by one-hot labels
    labels_oh = jax.nn.one_hot(y, num_classes)
    x_in = jnp.concatenate([x, labels_oh], axis=-1)
    model = make_gnn(cfg, num_features=8, num_classes=num_classes)
    params, state = model.init(jax.random.PRNGKey(0))
    logits, new_state, _ = model.apply(params, state, g, x_in, train=True,
                                       rng=jax.random.PRNGKey(1))
    assert logits.shape == (40, 3)
    # batch-norm running stats updated
    assert float(new_state["bn_in"]["count"]) == 1.0


def test_gnn_beltrami_forward():
    cfg = Config(beltrami=True, attention_type="exp_kernel",
                 feat_hidden_dim=6, pos_enc_hidden_dim=4, pos_enc_dim=5,
                 heads=2, attention_dim=8, block="attention",
                 function="laplacian", method="euler", step_size=0.5,
                 self_loop_weight=1.0)
    g, x, _ = synthetic_graph(num_feat=8)
    pos = jnp.asarray(np.random.RandomState(7).randn(40, 5), jnp.float32)
    model = make_gnn(cfg, num_features=8, num_classes=3)
    params, state = model.init(jax.random.PRNGKey(0))
    logits, _, _ = model.apply(params, state, g, x, train=False,
                               pos_encoding=pos)
    assert logits.shape == (40, 3)


@pytest.mark.slow
def test_gradients_flow_through_gnn():
    cfg = Config(hidden_dim=8, block="attention", function="laplacian",
                 heads=2, attention_dim=8, method="dopri5", time=1.0,
                 tol_scale=100.0, max_nfe=300, self_loop_weight=1.0,
                 input_dropout=0.0, dropout=0.0)
    g, x, y = synthetic_graph(num_feat=8)
    model = make_gnn(cfg, num_features=8, num_classes=3)
    params, state = model.init(jax.random.PRNGKey(0))

    def loss_fn(params):
        logits, _, _ = model.apply(params, state, g, x, train=True)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(40), y])

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0  # something learned


def test_early_stop_observer():
    """Early-stop eval: best_val/best_test populated, in [0,1]; horizon is
    earlystopxT·T (`test/test_early_stop.py`)."""
    cfg = Config(hidden_dim=8, block="constant", function="laplacian",
                 method="dopri5", time=2.0, tol_scale=10.0, max_nfe=500,
                 earlystopxT=2.0, self_loop_weight=1.0,
                 input_dropout=0.0, dropout=0.0)
    g, x, y = synthetic_graph(num_feat=8)
    model = make_gnn(cfg, num_features=8, num_classes=3)
    params, state = model.init(jax.random.PRNGKey(0))
    n = 40
    masks = [np.zeros(n, bool) for _ in range(3)]
    masks[0][:20] = True; masks[1][20:30] = True; masks[2][30:] = True
    res = evaluate_early_stop(cfg, model, params, state, g, x, y,
                              *(jnp.asarray(m) for m in masks))
    assert 0.0 <= float(res.best_val) <= 1.0
    assert 0.0 <= float(res.best_test) <= 1.0
    assert float(res.best_time) <= cfg.earlystopxT * cfg.time + 1e-6
    assert res.logits.shape == (40, 3)


def test_regularizers_integrate():
    cfg = Config(hidden_dim=4, block="constant", function="laplacian",
                 method="euler", step_size=0.25, time=1.0,
                 kinetic_energy=1.0, jacobian_norm2=0.1,
                 self_loop_weight=1.0)
    g, x, _ = synthetic_graph(num_feat=4)
    blk = get_block(cfg, 4)
    params = blk.init(jax.random.PRNGKey(0))
    out = blk.forward(params, g, x, train=True)
    assert len(out.reg_states) == 2
    assert out.reg_states[0].shape == (40,)
    # kinetic energy integral must be nonnegative
    assert float(out.reg_states[0].min()) >= 0.0
    # eval mode: no reg states
    out_eval = blk.forward(params, g, x, train=False)
    assert out_eval.reg_states == ()


def test_cgnn_forward():
    cfg = Config(hidden_dim=8, time=1.0, method="dopri5", tol_scale=100.0,
                 alpha=1.0, input_dropout=0.0, dropout=0.0)
    g, x, y = synthetic_graph(num_feat=8)
    model = make_cgnn(cfg, num_features=8, num_classes=3)
    params = model.init_for_graph(jax.random.PRNGKey(0), g)
    gn = normalize_for_cgnn(g)
    logits, aux = model.apply(params, gn, x, train=False)
    assert logits.shape == (40, 3)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_adjoint_training_path():
    cfg = Config(hidden_dim=6, block="constant", function="laplacian",
                 method="dopri5", adjoint=True, adjoint_method="dopri5",
                 time=1.0, tol_scale=100.0, tol_scale_adjoint=100.0,
                 self_loop_weight=1.0, input_dropout=0.0, dropout=0.0)
    g, x, y = synthetic_graph(num_feat=6)
    model = make_gnn(cfg, num_features=6, num_classes=3)
    params, state = model.init(jax.random.PRNGKey(0))

    def loss_fn(params):
        logits, _, _ = model.apply(params, state, g, x, train=True)
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(40), y])

    val, grads = jax.value_and_grad(loss_fn)(params)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0


def test_higher_order_block():
    """Order-2 (graph wave) dynamics: state augmentation integrates and
    differs from first-order diffusion; order=1 degrades to constant."""
    from graphax.blocks import make_higher_order_block

    cfg = Config(hidden_dim=6, function="laplacian", method="rk4",
                 step_size=0.25, time=2.0, self_loop_weight=1.0)
    g, x, _ = synthetic_graph(num_feat=6)
    blk2 = make_higher_order_block(cfg, 6, order=2)
    blk1 = make_higher_order_block(cfg, 6, order=1)
    p2 = blk2.init(jax.random.PRNGKey(0))
    out2 = blk2.forward(p2, g, x, train=False)
    out1 = blk1.forward(p2, g, x, train=False)
    assert out2.z.shape == x.shape
    assert np.isfinite(np.asarray(out2.z)).all()
    # wave vs diffusion dynamics genuinely differ
    assert float(jnp.abs(out2.z - out1.z).max()) > 1e-3

    # gradients flow through the augmented solve
    def loss(p):
        return jnp.sum(blk2.forward(p, g, x, train=True).z ** 2)

    flat, _ = jax.flatten_util.ravel_pytree(jax.grad(loss)(p2))
    assert np.isfinite(np.asarray(flat)).all()
