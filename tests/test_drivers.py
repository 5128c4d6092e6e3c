"""Driver-layer tests: CLI config assembly + best-params precedence, the
node-classification run with stats, multimodal MNIST-style and CLEVR-style
training (losses decrease), solver-comparison harness pickles, sweeps, and
visualization artifacts."""

import json
import os
import pickle
import tempfile

import numpy as np
import pytest

from graphax.drivers.run_gnn import build_parser, config_from_args, run
from graphax.drivers.run_multi import train_clevr_style, train_image_dataset
from graphax.drivers.explicit_implicit import run_experiment
from graphax.train.sweep import asha_sweep, replicate_best, sample_config
from graphax.train import Config


def test_cli_best_params_precedence():
    args = build_parser().parse_args(
        ["--dataset", "Cora", "--use_best_params", "--lr", "0.5"])
    cfg = config_from_args(args)
    assert cfg.block == "attention"         # from best params
    assert abs(cfg.lr - 0.5) < 1e-9         # explicit CLI wins
    assert abs(cfg.time - 18.294754260552843) < 1e-9


def test_cli_plain_config():
    args = build_parser().parse_args(["--dataset", "Citeseer",
                                      "--hidden_dim", "24",
                                      "--adjoint", "true"])
    cfg = config_from_args(args)
    assert cfg.hidden_dim == 24 and cfg.adjoint and cfg.dataset == "Citeseer"


@pytest.mark.slow
def test_run_gnn_end_to_end(capsys):
    cfg = Config(dataset="Cora", hidden_dim=12, block="constant",
                 function="laplacian", method="euler", step_size=1.0,
                 time=2.0, epoch=3, lr=0.02, no_early=True,
                 self_loop_weight=1.0, num_splits=2,
                 input_dropout=0.2, dropout=0.2)
    with tempfile.TemporaryDirectory() as td:
        summary = run(cfg, data_dir=td, log_every=0, num_splits=2)
    assert summary["test"]["n"] == 2
    assert 0.0 <= summary["test"]["mean"] <= 1.0
    assert summary["test"]["sem"] >= 0.0


def test_multimodal_mnist_style():
    out = train_image_dataset("MNIST", epochs=2, batch_size=4,
                              train_size=16, test_size=8, log=False,
                              data_dir="/tmp/definitely-missing")
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # synthetic blobs are learnable


@pytest.mark.slow
def test_clevr_style_with_cache():
    with tempfile.TemporaryDirectory() as td:
        cache = os.path.join(td, "clevr.h5")
        out = train_clevr_style(epochs=2, batch_size=4, num_samples=16,
                                cache_path=cache, log=False)
        assert os.path.exists(cache)
        losses = [h["loss"] for h in out["history"]]
        assert np.isfinite(losses).all()
        # second call loads from HDF5 cache
        out2 = train_clevr_style(epochs=1, batch_size=4, num_samples=16,
                                 cache_path=cache, log=False)
        assert np.isfinite(out2["history"][0]["loss"])


@pytest.mark.slow
def test_explicit_implicit_harness():
    with tempfile.TemporaryDirectory() as td:
        res = run_experiment(
            "Cora", methods=("euler", "dopri5"), step_sizes=(1.0,),
            runs=1, epochs=2, results_dir=td, data_dir=td,
            base_overrides=dict(hidden_dim=8, time=1.0))
        files = os.listdir(td)
        pickles = [f for f in files if f.endswith(".pickle")]
        assert len(pickles) == 2
        with open(os.path.join(td, pickles[0]), "rb") as f:
            rec = pickle.load(f)
        assert set(rec) >= {"epochs", "losses", "nfes", "val_accs", "best"}


def test_sample_config_consistency():
    rng = np.random.RandomState(0)
    from graphax.train.sweep import SEARCH_SPACES

    for _ in range(20):
        cfg = sample_config(Config(), SEARCH_SPACES["Cora"], rng)
        assert cfg.attention_dim % cfg.heads == 0


@pytest.mark.slow
def test_asha_sweep_small():
    from graphax.data import make_sbm_dataset
    from graphax.train import Trainer

    data = make_sbm_dataset(num_nodes=80, num_features=8, num_classes=3,
                            p_in=0.15, p_out=0.01, seed=0)
    base = Config(hidden_dim=8, block="constant", function="laplacian",
                  method="euler", step_size=1.0, time=1.0, no_early=True,
                  self_loop_weight=1.0, input_dropout=0.1, dropout=0.1)
    space = {"lr": ("loguniform", 1e-3, 1e-1),
             "hidden_dim": ("choice", [8, 16])}
    out = asha_sweep(lambda cfg: Trainer(cfg, data), base, space,
                     num_samples=4, max_epochs=8, grace_period=2,
                     reduction_factor=2)
    assert out["best_val"] > 0
    assert len(out["trials"]) == 4


def test_replicate_best_stats():
    from graphax.data import make_sbm_dataset
    from graphax.train import Trainer

    base = Config(hidden_dim=8, block="constant", function="laplacian",
                  method="euler", step_size=1.0, time=1.0, no_early=True,
                  self_loop_weight=1.0, epoch=3, input_dropout=0.1,
                  dropout=0.1)

    def make_trainer(cfg, split_seed):
        data = make_sbm_dataset(num_nodes=80, num_features=8,
                                num_classes=3, p_in=0.15, p_out=0.01,
                                seed=split_seed)
        return Trainer(cfg, data)

    out = replicate_best(make_trainer, base, reps=2, num_splits=2, epochs=3)
    assert out["val"]["n"] == 4
    assert "ci95" in out["val"] and out["val"]["ci95"] >= 0


def test_visualizations(tmp_path):
    import jax

    from graphax.data import make_sbm_dataset
    from graphax.drivers.visualize import (
        draw_attention_graph, plot_attention_heatmap, plot_image_diffusion,
    )

    data = make_sbm_dataset(num_nodes=40, seed=0)
    g = data.graph
    att = np.random.RandomState(0).rand(g.edge_buffer_size)
    p1 = draw_attention_graph(g, att, out_path=str(tmp_path / "g.png"))
    p2 = plot_attention_heatmap(g, att, out_path=str(tmp_path / "h.png"))
    x0 = np.random.rand(2, 28 * 28)
    p3 = plot_image_diffusion(x0, x0 * 0.5, 28, 28,
                              out_path=str(tmp_path / "d.png"),
                              num_images=2)
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


@pytest.mark.slow
def test_multimodal_dp_training():
    """MNIST-style pixel diffusion with 4-way data parallelism on the
    virtual mesh — gradients psum'd, loss decreases."""
    out = train_image_dataset("MNIST", epochs=2, batch_size=8,
                              train_size=16, test_size=8, log=False,
                              data_dir="/tmp/missing", dp_devices=4)
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_asha_sweep_checkpoint_resume():
    """Resumable sweeps (SURVEY §5.4): the trial table persists per rung;
    a restarted sweep skips completed work and returns the same result."""
    import os
    from graphax.data import make_sbm_dataset
    from graphax.train import Trainer

    data = make_sbm_dataset(num_nodes=80, num_features=8, num_classes=3,
                            p_in=0.15, p_out=0.01, seed=0)
    base = Config(hidden_dim=8, block="constant", function="laplacian",
                  method="euler", step_size=1.0, time=1.0, no_early=True,
                  self_loop_weight=1.0, input_dropout=0.0, dropout=0.0)
    space = {"lr": ("loguniform", 1e-3, 1e-1)}
    calls = []

    def make(cfg):
        calls.append(cfg.lr)
        return Trainer(cfg, data)

    with tempfile.TemporaryDirectory() as td:
        out1 = asha_sweep(make, base, space, num_samples=3, max_epochs=4,
                          grace_period=2, reduction_factor=2,
                          checkpoint_dir=td)
        n_fits = len(calls)
        assert os.path.exists(os.path.join(td, "sweep_state.json"))
        assert os.path.exists(os.path.join(td, "trial_0.ckpt.npz"))
        # a "crashed-and-restarted" sweep: same dir, fresh process state
        out2 = asha_sweep(make, base, space, num_samples=3, max_epochs=4,
                          grace_period=2, reduction_factor=2,
                          checkpoint_dir=td)
        assert len(calls) == n_fits          # no trial re-trained
        assert out2["best_val"] == out1["best_val"]
        assert abs(out2["best_config"].lr - out1["best_config"].lr) < 1e-12
