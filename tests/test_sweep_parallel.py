"""Concurrent trials + model-based search in the sweep layer.

The reference runs Ray Tune trials as parallel actors with fractional GPUs
(`src/graph_datasets/ray_tune.py:568-586`) and optionally proposes configs
with AxSearch (`src/ray_tune.py:359-394`). graphax mirrors both without the
Ray dependency: a thread pool pinning trials round-robin onto devices
(``max_concurrent=``), and a TPE proposer (``search="bayes"``).
"""

import math

import pytest
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphax import Config
from graphax.train.sweep import (
    TPEProposer, asha_sweep, loguniform, replicate_best, sample_config_kwargs,
    uniform, choice,
)

SPACE = {"lr": loguniform(1e-4, 1e-1), "dropout": uniform(0.0, 0.8)}


def _score(cfg):
    """Deterministic synthetic objective peaked at lr=1e-2, dropout=0.3."""
    return float(np.exp(-(math.log(cfg.lr / 1e-2)) ** 2
                        - (cfg.dropout - 0.3) ** 2))


class _MockTrainer:
    """fit() contract of graphax.train.Trainer, with a deterministic score
    and an optional artificial delay; records the device it ran on."""

    devices_seen = []

    def __init__(self, cfg, delay=0.0):
        self.cfg = cfg
        self.delay = delay

    def fit(self, epochs=None, seed=None, **kw):
        if self.delay:
            time.sleep(self.delay)
        (dev,) = jnp.zeros(1).devices()      # respects jax.default_device
        _MockTrainer.devices_seen.append(str(dev))
        acc = _score(self.cfg)
        return {"best": {"val_acc": acc, "test_acc": acc}}


def test_parallel_trials_match_sequential_and_scale():
    base = Config()
    kw = dict(space=SPACE, num_samples=6, max_epochs=2, grace_period=2,
              reduction_factor=2, seed=7)

    seq = asha_sweep(lambda c: _MockTrainer(c), base, **kw)

    _MockTrainer.devices_seen = []
    t0 = time.time()
    par = asha_sweep(lambda c: _MockTrainer(c, delay=0.25), base,
                     max_concurrent=4, devices=jax.devices()[:4], **kw)
    elapsed = time.time() - t0

    # identical trial population and winner (configs sampled up front)
    assert par["best_val"] == seq["best_val"]
    assert abs(par["best_config"].lr - seq["best_config"].lr) < 1e-12
    # trials actually spread over devices
    assert len(set(_MockTrainer.devices_seen)) >= 2
    # 6 trials x 0.25 s with 4 workers: two waves (~0.5 s), not 1.5 s
    assert elapsed < 1.2, elapsed


def test_parallel_trials_real_trainer_matches_sequential():
    from graphax.data import make_sbm_dataset
    from graphax.train import Trainer

    data = make_sbm_dataset(num_nodes=60, num_features=8, num_classes=3,
                            p_in=0.15, p_out=0.01, seed=0)
    base = Config(hidden_dim=8, block="constant", function="laplacian",
                  method="euler", step_size=1.0, time=1.0, no_early=True,
                  self_loop_weight=1.0, input_dropout=0.0, dropout=0.0)
    space = {"lr": loguniform(1e-3, 1e-1)}
    kw = dict(space=space, num_samples=3, max_epochs=2, grace_period=2,
              reduction_factor=2, seed=0)
    seq = asha_sweep(lambda c: Trainer(c, data), base, **kw)
    par = asha_sweep(lambda c: Trainer(c, data), base, max_concurrent=3,
                     **kw)
    assert par["best_val"] == seq["best_val"]
    assert abs(par["best_config"].lr - seq["best_config"].lr) < 1e-12


def test_bayes_search_concentrates_on_optimum():
    base = Config()
    out = asha_sweep(lambda c: _MockTrainer(c), base, space=SPACE,
                     num_samples=20, max_epochs=2, grace_period=2,
                     reduction_factor=2, seed=3, search="bayes",
                     max_concurrent=4, devices=jax.devices()[:4])
    trials = out["trials"]
    assert len(trials) == 20
    # the startup wave is random, later waves are TPE proposals: the
    # proposed half must score better on average than the random start
    startup = [t["val_acc"] for t in trials[:4]]
    proposed = [t["val_acc"] for t in trials[-8:]]
    assert np.mean(proposed) > np.mean(startup)
    assert out["best_val"] >= max(startup)
    # and the winner sits near the synthetic optimum
    assert abs(math.log(out["best_config"].lr / 1e-2)) < 1.5


def test_tpe_proposer_mixed_space():
    space = {"lr": loguniform(1e-4, 1e-1), "dropout": uniform(0.0, 0.8),
             "hidden_dim": choice(16, 32, 64)}
    rng = np.random.RandomState(0)

    def score(kw):
        return (-(math.log(kw["lr"] / 1e-2)) ** 2
                - (kw["dropout"] - 0.3) ** 2
                - (0.0 if kw["hidden_dim"] == 64 else 1.0))

    obs = []
    for _ in range(30):
        kw = sample_config_kwargs(space, rng)
        obs.append((kw, score(kw)))
    p = TPEProposer(space, seed=1)
    props = [p.propose(obs) for _ in range(20)]
    # proposals respect bounds and concentrate vs the random prior
    for kw in props:
        assert 1e-4 <= kw["lr"] <= 1e-1
        assert 0.0 <= kw["dropout"] <= 0.8
        assert kw["hidden_dim"] in (16, 32, 64)
    d_tpe = np.mean([abs(math.log(k["lr"] / 1e-2)) for k in props])
    d_rand = np.mean([abs(math.log(k["lr"] / 1e-2)) for k, _ in obs])
    assert d_tpe < 0.6 * d_rand
    assert np.mean([k["hidden_dim"] == 64 for k in props]) > 0.5


def test_replicate_best_parallel_matches_sequential():
    cfg = Config(lr=1e-2, dropout=0.3)
    seq = replicate_best(lambda c, s: _MockTrainer(c), cfg, reps=3,
                         num_splits=2)
    par = replicate_best(lambda c, s: _MockTrainer(c), cfg, reps=3,
                         num_splits=2, max_concurrent=3,
                         devices=jax.devices()[:3])
    assert seq["raw_val"] == par["raw_val"]
    assert seq["val"]["mean"] == par["val"]["mean"]


def test_bayes_resume_after_midwave_kill(tmp_path):
    """Review r4: a checkpointed bayes sweep killed during the startup
    wave must resume and finish (the fill loop previously spun forever
    with pending-but-uncreated work)."""
    base = Config()
    td = str(tmp_path)
    calls = {"n": 0}

    class _Dying(_MockTrainer):
        def fit(self, epochs=None, seed=None, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated kill")
            return super().fit(epochs=epochs, seed=seed, **kw)

    kw = dict(space=SPACE, num_samples=6, max_epochs=2, grace_period=2,
              reduction_factor=2, seed=5, search="bayes",
              checkpoint_dir=td)
    with pytest.raises(RuntimeError, match="simulated kill"):
        asha_sweep(lambda c: _Dying(c), base, **kw)

    out = asha_sweep(lambda c: _MockTrainer(c), base, **kw)
    assert len(out["trials"]) == 6
    assert all(t["epochs_done"] >= 2 for t in out["trials"])
    assert out["best_val"] > 0


def test_tpe_reaches_target_in_fewer_trials_than_random():
    """Model-based search EFFICACY (not just smoke): on a smooth seeded
    objective (peak at lr=1e-2, T=3) the TPE proposer reaches the target
    score in measurably fewer proposals than random sampling — the role
    AxSearch plays in the reference (`src/ray_tune.py:359-394`).
    Measured at authoring time over 8 seeds: 131 vs 439 total trials."""
    import numpy as np

    from graphax.train.sweep import TPEProposer, sample_config_kwargs

    space = {"lr": ("loguniform", 1e-4, 1.0), "T": ("uniform", 0.0, 10.0)}

    def score(kw):
        return -((np.log10(kw["lr"]) + 2.0) ** 2
                 + ((kw["T"] - 3.0) / 3.0) ** 2)

    target = -0.05

    def trials_to_target(propose, max_trials=120):
        obs = []
        for i in range(max_trials):
            kw = propose(obs)
            s = score(kw)
            obs.append((kw, s))
            if s >= target:
                return i + 1
        return max_trials + 1

    t_tpe, t_rand = [], []
    for seed in range(8):
        prop = TPEProposer(space, seed=seed)
        t_tpe.append(trials_to_target(prop.propose))
        rng = np.random.RandomState(1000 + seed)
        t_rand.append(trials_to_target(
            lambda obs: sample_config_kwargs(space, rng)))
    # hard efficacy bar: at least 2x fewer total trials, and better or
    # equal on the median seed
    assert sum(t_tpe) * 2 <= sum(t_rand), (t_tpe, t_rand)
    assert np.median(t_tpe) <= np.median(t_rand), (t_tpe, t_rand)
