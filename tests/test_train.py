"""Training-layer tests: end-to-end fit on a synthetic SBM (accuracy must
beat chance by a wide margin), label trick, optimizers, presets registry,
checkpoint round-trip, split protocol."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from graphax import Config
from graphax.data import make_sbm_dataset, set_train_val_test_split
from graphax.train import (
    Trainer, best_config, BEST_PARAMS, save_checkpoint, load_checkpoint,
    add_labels, get_label_masks, get_optimizer,
)


def small_cfg(**kw):
    base = dict(hidden_dim=16, block="constant", function="laplacian",
                method="euler", step_size=0.5, time=2.0, lr=0.02, decay=5e-4,
                input_dropout=0.2, dropout=0.2, self_loop_weight=1.0,
                optimizer="adam", no_early=True)
    base.update(kw)
    return Config(**base)


def test_fit_beats_chance():
    data = make_sbm_dataset(num_nodes=200, num_classes=4, num_features=16,
                            p_in=0.08, p_out=0.004, feature_noise=1.5, seed=1)
    trainer = Trainer(small_cfg(), data)
    result = trainer.fit(epochs=40)
    assert result["best"]["val_acc"] > 0.5      # chance = 0.25
    assert result["best"]["test_acc"] > 0.5
    assert result["history"][-1]["loss"] < result["history"][0]["loss"]


def test_fit_with_early_stop_integrator():
    data = make_sbm_dataset(num_nodes=150, num_classes=3, num_features=12,
                            p_in=0.1, p_out=0.005, seed=2)
    cfg = small_cfg(method="dopri5", tol_scale=100.0, max_nfe=500,
                    no_early=False, earlystopxT=2.0, time=2.0)
    trainer = Trainer(cfg, data)
    result = trainer.fit(epochs=10)
    assert result["best"]["val_acc"] > 0.4
    # best_time recorded from inside the solve
    assert 0.0 <= result["best"]["best_time"] <= cfg.earlystopxT * cfg.time


def test_label_trick():
    data = make_sbm_dataset(num_nodes=100, num_classes=3, num_features=8,
                            seed=3)
    cfg = small_cfg(use_labels=True, label_rate=0.5)
    trainer = Trainer(cfg, data)
    state = trainer.init_state()
    state, loss = trainer.train_step(state)
    assert np.isfinite(loss)
    accs = trainer.evaluate(state)
    assert all(0 <= a <= 1 for a in accs)


def test_get_label_masks_partition():
    rng = jax.random.PRNGKey(0)
    train = jnp.asarray(np.random.RandomState(0).rand(50) < 0.5)
    lm, pm = get_label_masks(rng, train, 0.5)
    assert not bool(jnp.any(lm & pm))
    assert bool(jnp.all((lm | pm) == train))


def test_add_labels_widens_features():
    feat = jnp.ones((5, 3))
    labels = jnp.asarray([0, 1, 2, 1, 0])
    mask = jnp.asarray([True, True, False, False, True])
    out = add_labels(feat, labels, mask, 3)
    assert out.shape == (5, 6)
    np.testing.assert_allclose(out[2, 3:], np.zeros(3))  # unmasked → zeros
    np.testing.assert_allclose(out[1, 3:], [0, 1, 0])


def test_all_optimizers_step():
    import optax
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3)}
    for name in ("sgd", "rmsprop", "adagrad", "adam", "adamax"):
        tx = get_optimizer(name, 0.01, 1e-4)
        st = tx.init(params)
        updates, _ = tx.update(grads, st, params)
        new = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(new["w"])).all()


def test_best_config_registry():
    assert set(BEST_PARAMS) == {"Cora", "Citeseer", "Pubmed", "CoauthorCS",
                                "Computers", "Photo", "ogbn-arxiv"}
    cora = best_config("Cora")
    assert cora.block == "attention" and cora.function == "laplacian"
    assert abs(cora.time - 18.294754260552843) < 1e-9
    assert cora.square_plus and cora.heads == 8
    arxiv = best_config("ogbn-arxiv", epoch=3)
    assert arxiv.block == "hard_attention" and arxiv.epoch == 3
    assert arxiv.adjoint and arxiv.adjoint_method == "rk4"


def test_checkpoint_roundtrip():
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 2)), jnp.asarray(3)),
            "c": {"d": jnp.zeros(3)}}
    with tempfile.TemporaryDirectory() as td:
        path = save_checkpoint(os.path.join(td, "ckpt"), tree)
        # structure-from-file
        back = load_checkpoint(path)
        np.testing.assert_allclose(back["a"], np.arange(5.0))
        np.testing.assert_allclose(back["b"][0], np.ones((2, 2)))
        # structure-from-template
        back2 = load_checkpoint(path, like=tree)
        np.testing.assert_allclose(back2["c"]["d"], np.zeros(3))


def test_split_protocol():
    y = np.random.RandomState(0).randint(0, 5, 2000)
    tr, va, te = set_train_val_test_split(12345, y, num_development=1500,
                                          num_per_class=20)
    assert tr.sum() == 100            # 20 per class × 5
    assert tr.sum() + va.sum() == 1500
    assert te.sum() == 500
    assert not (tr & va).any() and not (tr & te).any() and not (va & te).any()
    # deterministic given seed
    tr2, _, _ = set_train_val_test_split(12345, y, 1500, 20)
    np.testing.assert_array_equal(tr, tr2)


def test_fit_checkpoint_resume(tmp_path):
    """Trainer checkpoints and resumes mid-run (SURVEY §5.4)."""
    data = make_sbm_dataset(num_nodes=120, num_classes=3, num_features=10,
                            p_in=0.12, p_out=0.008, seed=11)
    cfg = small_cfg(epoch=6)
    path = str(tmp_path / "run")
    t1 = Trainer(cfg, data)
    out1 = t1.fit(epochs=4, checkpoint_path=path, checkpoint_every=2)
    # resume into more epochs: picks up at epoch 5
    t2 = Trainer(cfg, data)
    out2 = t2.fit(epochs=6, checkpoint_path=path, checkpoint_every=2)
    assert out2["history"][0]["epoch"] == 5
    assert len(out2["history"]) == 2
    assert out2["best"]["val_acc"] >= out1["best"]["val_acc"] - 1e-9


def test_split_step_matches_fused():
    """The 3-jit split train step (encoder fwd -> solve grad with x0 as an
    argument -> encoder bwd; the axon scheduler workaround, SCALING.md r5)
    must produce the SAME losses and parameters as the fused step — with
    dropout ON (rng consumption replicated), batch norm state threading,
    and a regularizer term."""
    import jax
    import numpy as np

    from graphax import Config
    from graphax.data import make_sbm_dataset
    from graphax.train import Trainer

    data = make_sbm_dataset(num_nodes=48, num_classes=3, num_features=6,
                            p_in=0.2, p_out=0.02, seed=4)
    cfg = Config(block="attention", function="laplacian", hidden_dim=8,
                 heads=2, attention_dim=8, method="rk4", step_size=0.5,
                 time=1.0, add_source=True, self_loop_weight=1.0,
                 input_dropout=0.2, dropout=0.3, batch_norm=True,
                 kinetic_energy=0.01, lr=0.02, no_early=True)
    tr_f = Trainer(cfg, data, split_step=False)
    tr_s = Trainer(cfg, data, split_step=True)
    s_f = tr_f.init_state(0)
    s_s = tr_s.init_state(0)
    for _ in range(3):
        s_f, lf = tr_f.train_step(s_f)
        s_s, ls = tr_s.train_step(s_s)
        np.testing.assert_allclose(ls, lf, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.params),
                    jax.tree_util.tree_leaves(s_s.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
    # model state (bn running stats) matches too
    for a, b in zip(jax.tree_util.tree_leaves(s_f.model_state),
                    jax.tree_util.tree_leaves(s_s.model_state)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
