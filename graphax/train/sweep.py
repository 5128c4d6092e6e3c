"""Hyperparameter sweeps without the Ray dependency.

The reference drives everything through Ray Tune with an ASHA scheduler
(`src/ray_tune.py:359-394`, `src/graph_datasets/ray_tune.py:547-586`) and
replicates best trials with mean/sem/95%-CI stats (`src/run_best_ray.py`).
Here: the same per-dataset search-space definitions, an in-process
successive-halving (ASHA-style) runner with checkpointed rungs, and
`replicate_best` for the reps×splits statistics protocol."""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from graphax.train.config import Config
from graphax.utils.stats import summarize_runs


# -- search spaces (`set_cora_search_space` et al., ray_tune.py:187-345) ----

def loguniform(lo, hi):
    return ("loguniform", lo, hi)


def uniform(lo, hi):
    return ("uniform", lo, hi)


def choice(*opts):
    return ("choice", list(opts))


SEARCH_SPACES = {
    "Cora": {
        "decay": loguniform(1e-3, 1e-1),
        "lr": loguniform(5e-3, 5e-2),
        "dropout": uniform(0.0, 0.8),
        "input_dropout": uniform(0.2, 0.8),
        "hidden_dim": choice(32, 64, 80, 128),
        "heads": choice(1, 2, 4, 8),
        "time": uniform(2.0, 30.0),
        "tol_scale": loguniform(1.0, 1e4),
        "attention_dim": choice(16, 32, 64, 128),
        "block": choice("constant", "attention"),
    },
}
SEARCH_SPACES["Citeseer"] = SEARCH_SPACES["Cora"]
SEARCH_SPACES["Pubmed"] = SEARCH_SPACES["Cora"]
SEARCH_SPACES["default"] = SEARCH_SPACES["Cora"]


def sample_config(base: Config, space: Dict[str, Any],
                  rng: np.random.RandomState) -> Config:
    kw = {}
    for name, spec in space.items():
        kind = spec[0]
        if kind == "loguniform":
            kw[name] = float(np.exp(rng.uniform(np.log(spec[1]),
                                                np.log(spec[2]))))
        elif kind == "uniform":
            kw[name] = float(rng.uniform(spec[1], spec[2]))
        elif kind == "choice":
            kw[name] = spec[1][rng.randint(len(spec[1]))]
    # keep heads | attention_dim consistent
    if "heads" in kw and "attention_dim" in kw:
        if kw["attention_dim"] % kw["heads"] != 0:
            kw["attention_dim"] = kw["heads"] * max(
                kw["attention_dim"] // kw["heads"], 1)
    return base.replace(**kw)


def _save_sweep_state(path: str, trials, rung: int, alive_ids) -> None:
    import dataclasses
    import json
    import os

    payload = {
        "rung": rung,
        "alive_ids": list(alive_ids),
        "trials": [{**t, "cfg": dataclasses.asdict(t["cfg"])}
                   for t in trials],
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def _load_sweep_state(path: str):
    import json
    import os

    if not os.path.exists(path):
        return None
    with open(path) as f:
        payload = json.load(f)
    for t in payload["trials"]:
        t["cfg"] = Config(**t["cfg"])
    return payload


def asha_sweep(make_trainer: Callable[[Config], Any], base: Config,
               space: Optional[Dict[str, Any]] = None, num_samples: int = 16,
               max_epochs: int = 64, grace_period: int = 4,
               reduction_factor: int = 4, seed: int = 0,
               verbose: bool = False,
               checkpoint_dir: Optional[str] = None) -> Dict[str, Any]:
    """Asynchronous-successive-halving style sweep, run synchronously rung
    by rung: every surviving trial trains to the next rung budget and the
    top 1/reduction_factor continue. ``make_trainer(cfg)`` must return an
    object with ``fit(epochs) -> {'best': {'val_acc': ...}}``.

    ``checkpoint_dir`` makes the sweep resumable, mirroring the reference's
    per-epoch Ray trial checkpoints (`src/graph_datasets/ray_tune.py:
    167-197`, SURVEY §5.4): the trial table is persisted after every trial
    completes a rung, each trial's model/optimizer state checkpoints into
    ``trial_{id}.ckpt`` (so later rungs CONTINUE training instead of
    restarting, and a killed sweep resumes where it stopped)."""
    import os

    space = space or SEARCH_SPACES.get(base.dataset,
                                       SEARCH_SPACES["default"])
    state_path = None
    saved = None
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        state_path = os.path.join(checkpoint_dir, "sweep_state.json")
        saved = _load_sweep_state(state_path)

    if saved is not None:
        trials = saved["trials"]
        rung = saved["rung"]
        alive = [t for t in trials if t["id"] in set(saved["alive_ids"])]
    else:
        rng = np.random.RandomState(seed)
        trials = [
            {"cfg": sample_config(base, space, rng), "epochs_done": 0,
             "val_acc": 0.0, "test_acc": 0.0, "id": i}
            for i in range(num_samples)
        ]
        rung = grace_period
        alive = list(trials)

    while alive:
        for t in alive:
            if t["epochs_done"] >= rung:
                continue    # already trained to this rung (resume path)
            trainer = make_trainer(t["cfg"])
            fit_kwargs = {}
            if checkpoint_dir is not None:
                fit_kwargs = dict(
                    checkpoint_path=os.path.join(checkpoint_dir,
                                                 f"trial_{t['id']}.ckpt"),
                    checkpoint_every=1)
            result = trainer.fit(epochs=rung, **fit_kwargs)
            t["epochs_done"] = rung
            t["val_acc"] = result["best"]["val_acc"]
            t["test_acc"] = result["best"]["test_acc"]
            if verbose:
                print(f"trial {t['id']:3d} @ {rung:3d}ep: "
                      f"val {t['val_acc']:.4f}")
            if state_path is not None:
                _save_sweep_state(state_path, trials, rung,
                                  [a["id"] for a in alive])
        if rung >= max_epochs:
            break
        alive.sort(key=lambda t: -t["val_acc"])
        keep = max(len(alive) // reduction_factor, 1)
        alive = alive[:keep]
        rung = min(rung * reduction_factor, max_epochs)
        if state_path is not None:
            _save_sweep_state(state_path, trials, rung,
                              [a["id"] for a in alive])

    best = max(trials, key=lambda t: t["val_acc"])
    return {"best_config": best["cfg"], "best_val": best["val_acc"],
            "best_test": best["test_acc"], "trials": trials}


def replicate_best(make_trainer: Callable[[Config, int], Any], cfg: Config,
                   reps: int = 3, num_splits: int = 2,
                   epochs: Optional[int] = None) -> Dict[str, Any]:
    """Re-run a config reps × splits times and report mean/std/sem/95%-CI
    (`src/run_best_ray.py:56-74`). ``make_trainer(cfg, split_seed)``."""
    vals, tests = [], []
    for split in range(num_splits):
        for rep in range(reps):
            trainer = make_trainer(cfg, split)
            out = trainer.fit(epochs=epochs, seed=rep * 1000 + split)
            vals.append(out["best"]["val_acc"])
            tests.append(out["best"]["test_acc"])
    return {"val": summarize_runs(vals), "test": summarize_runs(tests),
            "raw_val": vals, "raw_test": tests}
