"""Sharded full-model parity: the multi-chip GRAND/BLEND model
(graphax.dist.model) vs the single-chip Trainer, with TRANSPLANTED weights
(identical param pytree). Covers: dopri5 through the sharded RHS with a
psum'd masked error norm (identical step sequences), the attention and
hard-attention blocks (distributed histogram quantile), batch-norm with
psum'd statistics, the adjoint training path, and the early-stop observer
with psum'd accuracies."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax import Config
from graphax.data import make_sbm_dataset
from graphax.dist import make_mesh
from graphax.dist.model import make_sharded_gnn, normalized_partition
from graphax.dist.partition import shard_nodes, unshard_nodes
from graphax.train.loop import Trainer


def _data(seed=0, n=96):
    d = make_sbm_dataset(num_nodes=n, num_classes=3, num_features=12,
                         p_in=0.15, p_out=0.01, feature_noise=2.0, seed=seed)
    return dataclasses.replace(d, graph=dataclasses.replace(
        d.graph, strategy="edge"))


def _shard_all(data, part):
    xs = jnp.asarray(shard_nodes(np.asarray(data.x), part))
    ys = jnp.asarray(shard_nodes(
        np.asarray(data.y)[:, None], part))[..., 0].astype(jnp.int32)
    sh = lambda m: jnp.asarray(shard_nodes(
        np.asarray(m)[:, None].astype(np.float32), part))[..., 0] > 0.5
    return xs, ys, sh(data.train_mask), sh(data.val_mask), sh(data.test_mask)


CFGS = {
    "attention_dopri5": Config(
        block="attention", function="laplacian", hidden_dim=16, heads=2,
        attention_dim=16, method="dopri5", time=2.0, tol_scale=10.0,
        add_source=True, self_loop_weight=1.0, input_dropout=0.0,
        dropout=0.0, lr=0.02, no_early=True, max_nfe=500),
    "hard_attention_rk4": Config(
        block="hard_attention", function="laplacian", hidden_dim=16, heads=2,
        attention_dim=16, method="rk4", step_size=0.5, time=2.0,
        att_samp_pct=0.6, add_source=True, self_loop_weight=1.0,
        input_dropout=0.0, dropout=0.0, lr=0.02, no_early=True),
    "transformer_bn": Config(
        block="constant", function="transformer", hidden_dim=16, heads=2,
        attention_dim=16, method="dopri5", time=1.5, tol_scale=10.0,
        batch_norm=True, add_source=True, self_loop_weight=1.0,
        input_dropout=0.0, dropout=0.0, lr=0.02, no_early=True, max_nfe=500),
    "mixed_norm_idx1_squareplus": Config(
        block="mixed", function="laplacian", hidden_dim=16, heads=2,
        attention_dim=16, attention_norm_idx=1, square_plus=True,
        method="rk4", step_size=0.5, time=2.0, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0, lr=0.02,
        no_early=True),
}


@pytest.mark.parametrize("local_tiles", [False, True],
                         ids=["xla-local", "mxu-tiled-local"])
@pytest.mark.parametrize("name", sorted(CFGS))
def test_sharded_forward_matches_single_chip(name, local_tiles):
    """Transplanted weights, eval forward: sharded logits == Trainer logits
    (same solver step sequences — the masked psum'd norm reproduces the
    single-chip error norm exactly). ``mxu-tiled-local`` runs each shard's
    per-NFE reductions on the row-tiled MXU path (graphax.kernels
    .segment_mxu) including the overlap-split tile pair."""
    cfg = CFGS[name]
    data = _data()
    trainer = Trainer(cfg, data)
    state = trainer.init_state(seed=0)

    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes, local_tiles=local_tiles)
    xs, ys, m_tr, m_va, m_te = _shard_all(data, part)

    logits_sh = unshard_nodes(
        np.asarray(sharded.forward_logits(state.params, state.model_state,
                                          xs)), part)
    feat, _ = trainer._prepare_features(None, train=False)
    logits_1, _, aux = trainer.model.apply(
        state.params, state.model_state, data.graph, feat, train=False)
    np.testing.assert_allclose(logits_sh, np.asarray(logits_1), rtol=2e-4,
                               atol=2e-5)


def test_sharded_tiled_local_training_matches_xla_local():
    """Training losses with the MXU-tiled local compute track the XLA-local
    sharded model AND the single-chip Trainer (laplacian overlap split +
    transformer per-NFE recompute both exercised)."""
    for name in ("attention_dopri5", "transformer_bn"):
        cfg = CFGS[name]
        data = _data(n=64)
        trainer = Trainer(cfg, data)
        st = trainer.init_state(seed=0)
        mesh = make_mesh((8,), ("graph",))
        part = normalized_partition(cfg, data.graph, 8)
        xs, ys, m_tr, *_ = _shard_all(data, part)

        losses = {}
        for lt in (False, True):
            sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                                       data.num_classes, local_tiles=lt)
            params, mstate = st.params, st.model_state
            opt_state = trainer.tx.init(params)
            ls = []
            for i in range(2):
                params, mstate, opt_state, loss, nfe = sharded.train_step(
                    params, mstate, opt_state, xs, ys, m_tr,
                    jax.random.fold_in(jax.random.PRNGKey(1), i))
                ls.append(float(np.ravel(np.asarray(loss))[0]))
            losses[lt] = ls
        np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4,
                                   atol=2e-5)
        state, loss1 = trainer.train_step(st)
        np.testing.assert_allclose(losses[True][0], loss1, rtol=2e-4,
                                   atol=2e-5)


@pytest.mark.parametrize("name", ["attention_dopri5", "hard_attention_rk4"])
@pytest.mark.slow
def test_sharded_training_matches_single_chip(name):
    """3 full training steps, same init: losses track the single-chip
    Trainer's (both use the same optimizer and the same quantile path)."""
    cfg = CFGS[name]
    data = _data()
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)

    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, m_va, m_te = _shard_all(data, part)

    params, mstate = st.params, st.model_state
    opt_state = trainer.tx.init(params)
    losses_sh = []
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        params, mstate, opt_state, loss, nfe = sharded.train_step(
            params, mstate, opt_state, xs, ys, m_tr,
            jax.random.fold_in(rng, i))
        losses_sh.append(float(np.ravel(np.asarray(loss))[0]))

    state = st
    losses_1 = []
    for _ in range(3):
        state, loss = trainer.train_step(state)
        losses_1.append(loss)

    np.testing.assert_allclose(losses_sh, losses_1, rtol=2e-4, atol=2e-5)
    # and the updated parameters agree
    w_sh = np.asarray(params["m2"]["w"])
    w_1 = np.asarray(state.params["m2"]["w"])
    np.testing.assert_allclose(w_sh, w_1, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_sharded_adjoint_trains():
    """dopri5 forward + adaptive_heun adjoint backward, all inside
    shard_map: loss decreases and grads stay finite; forward loss at shared
    params equals the single-chip adjoint forward loss."""
    cfg = CFGS["attention_dopri5"].replace(adjoint=True,
                                           adjoint_method="adaptive_heun",
                                           tol_scale_adjoint=10.0)
    data = _data()
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)

    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    params, mstate = st.params, st.model_state
    opt_state = trainer.tx.init(params)
    rng = jax.random.PRNGKey(2)
    losses = []
    for i in range(4):
        params, mstate, opt_state, loss, nfe = sharded.train_step(
            params, mstate, opt_state, xs, ys, m_tr,
            jax.random.fold_in(rng, i))
        losses.append(float(np.ravel(np.asarray(loss))[0]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # step-1 loss parity vs the single-chip adjoint path (forward identical)
    state1, loss1 = trainer.train_step(st)
    np.testing.assert_allclose(losses[0], loss1, rtol=2e-4, atol=2e-5)


def test_sharded_early_stop_matches_single_chip():
    """The early-stop observer (psum'd accuracies) returns the same best
    val/test/time as the single-chip evaluate_early."""
    cfg = CFGS["attention_dopri5"].replace(no_early=False, earlystopxT=2.0,
                                           max_test_steps=50)
    data = _data()
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)

    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, m_va, m_te = _shard_all(data, part)

    got = sharded.eval_early(st.params, st.model_state, xs, ys, m_tr, m_va,
                             m_te)
    want = trainer.evaluate_early(st)
    np.testing.assert_allclose(float(got["best_val"]),
                               float(want.best_val), atol=1e-6)
    np.testing.assert_allclose(float(got["best_test"]),
                               float(want.best_test), atol=1e-6)
    # the overlap split reassociates the RHS sums (loc + halo partials), so
    # accepted dopri5 steps land at fp-order-different times; accuracies
    # above still match exactly
    np.testing.assert_allclose(float(got["best_time"]),
                               float(want.best_time), rtol=5e-3)
    assert abs(int(got["nfe"]) - int(want.nfe)) <= 12  # ≤2 steps drift


def test_sharded_gat_forward_matches_single_chip():
    """GAT RHS (per-NFE GAT attention recompute) sharded vs single-chip."""
    cfg = Config(
        block="constant", function="GAT", hidden_dim=16, heads=2,
        attention_dim=16, method="rk4", step_size=0.5, time=2.0,
        add_source=True, self_loop_weight=1.0, input_dropout=0.0,
        dropout=0.0, lr=0.02, no_early=True)
    data = _data()
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    logits_sh = unshard_nodes(
        np.asarray(sharded.forward_logits(st.params, st.model_state, xs)),
        part)
    feat, _ = trainer._prepare_features(None, train=False)
    logits_1, _, _ = trainer.model.apply(
        st.params, st.model_state, data.graph, feat, train=False)
    np.testing.assert_allclose(logits_sh, np.asarray(logits_1), rtol=2e-4,
                               atol=2e-5)

    # and a hard-attention block pinned from the GAT layer trains
    cfg2 = cfg.replace(block="hard_attention", att_samp_pct=0.7)
    trainer2 = Trainer(cfg2, data)
    st2 = trainer2.init_state(seed=0)
    sharded2 = make_sharded_gnn(mesh, normalized_partition(cfg2, data.graph,
                                                           8),
                                cfg2, data.num_features, data.num_classes)
    params, mstate = st2.params, st2.model_state
    opt_state = trainer2.tx.init(params)
    params, mstate, opt_state, loss, nfe = sharded2.train_step(
        params, mstate, opt_state, xs, ys, m_tr, jax.random.PRNGKey(0))
    st2b, loss1 = trainer2.train_step(st2)
    np.testing.assert_allclose(float(np.ravel(np.asarray(loss))[0]), loss1,
                               rtol=2e-4, atol=2e-5)


def test_sharded_regularizers_match_single_chip():
    """n_reg > 0: kinetic + directional regularizer states integrate
    alongside the diffusion inside shard_map (augmented masked error norm,
    psum'd masked means in the loss) and the training losses match the
    single-chip Trainer's."""
    cfg = Config(
        block="attention", function="laplacian", hidden_dim=16, heads=2,
        attention_dim=16, method="dopri5", time=1.5, tol_scale=10.0,
        kinetic_energy=0.05, directional_penalty=0.02, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0, lr=0.02,
        no_early=True, max_nfe=500)
    assert cfg.n_reg == 2
    data = _data()
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    params, mstate = st.params, st.model_state
    opt_state = trainer.tx.init(params)
    losses_sh = []
    for i in range(2):
        params, mstate, opt_state, loss, nfe = sharded.train_step(
            params, mstate, opt_state, xs, ys, m_tr,
            jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses_sh.append(float(np.ravel(np.asarray(loss))[0]))

    state, losses_1 = st, []
    for _ in range(2):
        state, loss = trainer.train_step(state)
        losses_1.append(loss)
    np.testing.assert_allclose(losses_sh, losses_1, rtol=2e-4, atol=2e-5)
    # the reg contribution is nonzero (the losses differ from the plain-CE
    # run by the penalty terms)
    cfg0 = cfg.replace(kinetic_energy=None, directional_penalty=None)
    t0 = Trainer(cfg0, data)
    s0 = t0.init_state(seed=0)
    _, loss_plain = t0.train_step(s0)
    assert abs(losses_1[0] - loss_plain) > 1e-5


def test_sharded_regularized_adjoint_trains():
    """Adjoint backward through the augmented (x, reg) state, sharded."""
    cfg = Config(
        block="constant", function="laplacian", hidden_dim=12, heads=2,
        attention_dim=12, method="dopri5", time=1.0, tol_scale=10.0,
        kinetic_energy=0.1, adjoint=True, adjoint_method="adaptive_heun",
        tol_scale_adjoint=10.0, add_source=True, self_loop_weight=1.0,
        input_dropout=0.0, dropout=0.0, lr=0.02, no_early=True, max_nfe=500)
    data = _data(n=64)
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, *_ = _shard_all(data, part)
    params, mstate = st.params, st.model_state
    opt_state = trainer.tx.init(params)
    losses = []
    for i in range(3):
        params, mstate, opt_state, loss, nfe = sharded.train_step(
            params, mstate, opt_state, xs, ys, m_tr,
            jax.random.fold_in(jax.random.PRNGKey(2), i))
        losses.append(float(np.ravel(np.asarray(loss))[0]))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    # step-1 loss parity vs single-chip adjoint+reg (forward identical)
    _, loss1 = trainer.train_step(st)
    np.testing.assert_allclose(losses[0], loss1, rtol=2e-4, atol=2e-5)


def test_sharded_rewire_eval_matches_single_chip():
    """Rewire-attention EVAL path (original graph, recomputed attention):
    sharded logits == single-chip logits."""
    cfg = Config(
        block="rewire_attention", function="laplacian", hidden_dim=16,
        heads=2, attention_dim=16, new_edges="k_hop_att", att_samp_pct=0.8,
        method="rk4", step_size=0.5, time=1.5, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0, lr=0.02,
        no_early=True)
    data = _data()
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    logits_sh = unshard_nodes(
        np.asarray(sharded.forward_logits(st.params, st.model_state, xs)),
        part)
    feat, _ = trainer._prepare_features(None, train=False)
    logits_1, _, _ = trainer.model.apply(
        st.params, st.model_state, data.graph, feat, train=False)
    np.testing.assert_allclose(logits_sh, np.asarray(logits_1), rtol=2e-4,
                               atol=2e-5)


def test_sharded_rewire_train_matches_single_chip():
    """Rewire-attention TRAIN path (2-hop densify S=½A+½A², quantile
    threshold, renormalize) as the sharded dense row-slab: the step-1
    training loss matches the single-chip block's (same kept edge set when
    candidates fit the single-chip buffer) and training makes progress."""
    cfg = Config(
        block="rewire_attention", function="laplacian", hidden_dim=16,
        heads=2, attention_dim=16, new_edges="k_hop_att", att_samp_pct=0.8,
        method="rk4", step_size=0.5, time=1.5, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0, lr=0.02,
        no_early=True)
    data = _data(n=64)
    # a large edge buffer so the single-chip top-E_buf cap keeps every
    # 2-hop candidate (the documented condition for exact agreement)
    import dataclasses as _dc

    from graphax.sparse import Graph

    g = data.graph
    n = g.num_nodes
    em = np.asarray(g.edge_mask)
    g_big = Graph.from_edges(np.asarray(g.row)[em], np.asarray(g.col)[em],
                             n, np.asarray(g.edge_weight)[em],
                             edge_buffer_size=n * n)
    data = _dc.replace(data, graph=_dc.replace(g_big, strategy="edge"))
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    params, mstate = st.params, st.model_state
    opt_state = trainer.tx.init(params)
    losses = []
    for i in range(3):
        params, mstate, opt_state, loss, nfe = sharded.train_step(
            params, mstate, opt_state, xs, ys, m_tr,
            jax.random.fold_in(jax.random.PRNGKey(3), i))
        losses.append(float(np.ravel(np.asarray(loss))[0]))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    _, loss1 = trainer.train_step(st)
    np.testing.assert_allclose(losses[0], loss1, rtol=5e-3)


def test_single_shard_mesh_trains():
    """A 1-shard mesh (halo-free partition) must work: the halo tables get
    a non-empty floor (regression: zero-size halo buffers crashed the
    gather in _spmm_overlap), and both local-compute paths agree."""
    cfg = CFGS["attention_dopri5"]
    data = _data(n=64)
    mesh = make_mesh((1,), ("graph",))
    part = normalized_partition(cfg, data.graph, 1)
    assert part.halo_size > 0 and part.pair_size > 0
    xs, ys, m_tr, *_ = _shard_all(data, part)
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    losses = {}
    for lt in (False, True):
        sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                                   data.num_classes, local_tiles=lt)
        params, mstate = st.params, st.model_state
        opt_state = trainer.tx.init(params)
        _, _, _, loss, _ = sharded.train_step(
            params, mstate, opt_state, xs, ys, m_tr, jax.random.PRNGKey(0))
        losses[lt] = float(np.ravel(np.asarray(loss))[0])
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)
    # and matches the single-chip Trainer exactly (1 shard == 1 chip)
    _, loss1 = trainer.train_step(st)
    np.testing.assert_allclose(losses[False], loss1, rtol=2e-4, atol=2e-5)


def test_dist_trainer_checkpoint_resume_and_interchange(tmp_path):
    """DistTrainer.fit checkpoints and resumes; checkpoints interchange
    with the single-chip Trainer (replicated params — SURVEY §5.4)."""
    from graphax.dist.trainer import DistTrainer

    cfg = CFGS["hard_attention_rk4"].replace(epoch=4, mesh_shape=(8,))
    data = _data(n=64)
    ck = str(tmp_path / "dist_ck")

    t1 = DistTrainer(cfg, data)
    out1 = t1.fit(epochs=4, checkpoint_path=ck, checkpoint_every=2, seed=0)
    assert (tmp_path / "dist_ck.npz").exists()

    # resume continues from epoch 5, not from scratch
    t2 = DistTrainer(cfg, data)
    out2 = t2.fit(epochs=6, checkpoint_path=ck, seed=0)
    assert out2["history"][0]["epoch"] == 5
    assert len(out2["history"]) == 2

    # single-chip Trainer loads the SAME checkpoint (same pytree)
    t_single = Trainer(cfg, data)
    st = t_single.init_state(seed=0)
    resumed = t_single._try_resume(ck, st)
    assert resumed is not None
    state_s, best_s, start_s = resumed
    np.testing.assert_allclose(
        np.asarray(state_s.params["m2"]["w"]),
        np.asarray(out2["state"].params["m2"]["w"]), rtol=1e-6)


@pytest.mark.slow
def test_sharded_beltrami_forward():
    """Beltrami exp_kernel (BLEND) forward runs sharded and matches the
    single-chip model."""
    cfg = Config(
        block="attention", function="laplacian", beltrami=True,
        attention_type="exp_kernel", feat_hidden_dim=12,
        pos_enc_hidden_dim=4, pos_enc_dim=6, heads=2, attention_dim=16,
        method="rk4", step_size=0.5, time=1.5, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0,
        no_early=True)
    data = _data()
    rngp = np.random.RandomState(3)
    pos = rngp.randn(data.graph.num_nodes, 6).astype(np.float32)
    data = dataclasses.replace(data, pos_encoding=jnp.asarray(pos))

    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes)
    xs, ys, *_ = _shard_all(data, part)
    pos_sh = jnp.asarray(shard_nodes(pos, part))

    logits_sh = unshard_nodes(
        np.asarray(sharded.forward_logits(st.params, st.model_state, xs,
                                          pos=pos_sh)), part)
    feat, _ = trainer._prepare_features(None, train=False)
    logits_1, _, _ = trainer.model.apply(
        st.params, st.model_state, data.graph, feat, train=False,
        pos_encoding=data.pos_encoding)
    np.testing.assert_allclose(logits_sh, np.asarray(logits_1), rtol=2e-4,
                               atol=2e-5)


# ----------------------------------------------------------------------
# Windowed + hub-slab local compute inside the production model (r4)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("name", ["attention_dopri5", "hard_attention_rk4"])
def test_sharded_windowed_forward_matches_single_chip(name):
    """``local_tiles="windowed"``: the laplacian per-NFE SpMM runs as the
    block-dense window matmuls (pinned attention values densified once per
    forward) — logits match the single-chip Trainer."""
    cfg = CFGS[name]
    data = _data()
    trainer = Trainer(cfg, data)
    state = trainer.init_state(seed=0)

    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes, local_tiles="windowed",
                               window=64)
    xs, *_ = _shard_all(data, part)

    logits_sh = unshard_nodes(
        np.asarray(sharded.forward_logits(state.params, state.model_state,
                                          xs)), part)
    feat, _ = trainer._prepare_features(None, train=False)
    logits_1, _, _ = trainer.model.apply(
        state.params, state.model_state, data.graph, feat, train=False)
    np.testing.assert_allclose(logits_sh, np.asarray(logits_1), rtol=2e-4,
                               atol=2e-5)


def test_sharded_windowed_training_matches_tiles():
    """Training losses through the windowed laplacian per-NFE path track
    the row-tiled path (same edges, reassociated sums) — gradients flow
    through the per-forward densify and the window matmuls."""
    cfg = CFGS["hard_attention_rk4"]
    data = _data(n=64)
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    losses = {}
    for lt in (True, "windowed"):
        sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                                   data.num_classes, local_tiles=lt,
                                   window=64)
        params, mstate = st.params, st.model_state
        opt_state = trainer.tx.init(params)
        ls = []
        for i in range(2):
            params, mstate, opt_state, loss, nfe = sharded.train_step(
                params, mstate, opt_state, xs, ys, m_tr,
                jax.random.fold_in(jax.random.PRNGKey(1), i))
            ls.append(float(np.ravel(np.asarray(loss))[0]))
        losses[lt] = ls
    np.testing.assert_allclose(losses["windowed"], losses[True], rtol=2e-4,
                               atol=2e-5)


def test_sharded_hub_forward_and_training():
    """``local_tiles="hub"``: constant-block laplacian diffusion with the
    psum'd hub slab + reduced-halo remainder — forward matches the
    single-chip Trainer and training matches the row-tiled path."""
    cfg = Config(
        block="constant", function="laplacian", hidden_dim=16,
        method="rk4", step_size=0.5, time=2.0, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0, lr=0.02,
        no_early=True)
    data = _data()
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((8,), ("graph",))
    part = normalized_partition(cfg, data.graph, 8)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                               data.num_classes, local_tiles="hub",
                               hub_candidates=(16,))
    logits_sh = unshard_nodes(
        np.asarray(sharded.forward_logits(st.params, st.model_state, xs)),
        part)
    feat, _ = trainer._prepare_features(None, train=False)
    logits_1, _, _ = trainer.model.apply(
        st.params, st.model_state, data.graph, feat, train=False)
    np.testing.assert_allclose(logits_sh, np.asarray(logits_1), rtol=2e-4,
                               atol=2e-5)

    losses = {}
    for lt in (True, "hub"):
        sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                                   data.num_classes, local_tiles=lt,
                                   hub_candidates=(16,))
        params, mstate = st.params, st.model_state
        opt_state = trainer.tx.init(params)
        ls = []
        for i in range(2):
            params, mstate, opt_state, loss, nfe = sharded.train_step(
                params, mstate, opt_state, xs, ys, m_tr,
                jax.random.fold_in(jax.random.PRNGKey(1), i))
            ls.append(float(np.ravel(np.asarray(loss))[0]))
        losses[str(lt)] = ls
    np.testing.assert_allclose(losses["hub"], losses["True"], rtol=2e-4,
                               atol=2e-5)


def test_auto_stage_remat_on_memory_ceiling(monkeypatch):
    """When the compiled train step's predicted HBM peak crosses the
    device budget, the model auto-enables per-evaluation remat instead of
    letting XLA silently spill (the measured 58x cliff, SCALING.md r4.2).
    Simulated here with a tiny GRAPHAX_HBM_BUDGET override."""
    data = _data(n=64)
    cfg = Config(block="constant", function="laplacian", hidden_dim=8,
                 method="euler", step_size=0.5, time=1.0,
                 input_dropout=0.0, dropout=0.0, lr=0.02, no_early=True)
    mesh = make_mesh((4,), ("graph",))
    part = normalized_partition(cfg, data.graph, 4)
    xs, ys, m_tr, m_va, m_te = _shard_all(data, part)

    monkeypatch.setenv("GRAPHAX_HBM_BUDGET", "1024")    # 1 KiB: always over
    sh = make_sharded_gnn(mesh, part, cfg, data.num_features,
                          data.num_classes)
    params, state = sh.init(jax.random.PRNGKey(0))
    from graphax.train.optimizers import get_optimizer

    opt_state = get_optimizer(cfg.optimizer, cfg.lr, cfg.decay).init(params)
    out = sh.train_step(params, state, opt_state, xs, ys, m_tr,
                        jax.random.PRNGKey(1))
    assert sh.internals["force_remat"][0] is True
    assert np.isfinite(float(np.ravel(np.asarray(out[3]))[0]))

    # and with a huge budget the flag stays off
    monkeypatch.setenv("GRAPHAX_HBM_BUDGET", str(1 << 50))
    sh2 = make_sharded_gnn(mesh, part, cfg, data.num_features,
                           data.num_classes)
    params2, state2 = sh2.init(jax.random.PRNGKey(0))
    out2 = sh2.train_step(params2, state2, opt_state, xs, ys, m_tr,
                          jax.random.PRNGKey(1))
    assert sh2.internals["force_remat"][0] is False
    np.testing.assert_allclose(
        float(np.ravel(np.asarray(out[3]))[0]),
        float(np.ravel(np.asarray(out2[3]))[0]), rtol=1e-5)


def test_sharded_windowed_single_shard_single_pass():
    """p_sh == 1 skips the halo window pass entirely (the dense split
    would be an all-zero second sweep) — losses must still match the
    tiled local compute."""
    cfg = CFGS["hard_attention_rk4"]
    data = _data(n=64)
    trainer = Trainer(cfg, data)
    st = trainer.init_state(seed=0)
    mesh = make_mesh((1,), ("graph",))
    part = normalized_partition(cfg, data.graph, 1)
    xs, ys, m_tr, *_ = _shard_all(data, part)

    losses = {}
    for lt in (True, "windowed"):
        sharded = make_sharded_gnn(mesh, part, cfg, data.num_features,
                                   data.num_classes, local_tiles=lt,
                                   window=64)
        params, mstate = st.params, st.model_state
        opt_state = trainer.tx.init(params)
        ls = []
        for i in range(2):
            params, mstate, opt_state, loss, _ = sharded.train_step(
                params, mstate, opt_state, xs, ys, m_tr,
                jax.random.PRNGKey(5))
            ls.append(float(np.ravel(np.asarray(loss))[0]))
        losses[lt] = ls
    np.testing.assert_allclose(losses["windowed"], losses[True],
                               rtol=2e-4, atol=2e-5)
