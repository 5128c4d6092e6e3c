"""Hyperparameter sweep CLI — `python -m graphax.drivers.sweep`.

The reference's `ray_tune.py` entry point without the Ray dependency:
ASHA-style successive halving over the per-dataset search spaces, then
optional replication of the winner with CI statistics
(`run_best_ray.py` capability)."""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--max_epochs", type=int, default=32)
    p.add_argument("--grace_period", type=int, default=4)
    p.add_argument("--reduction_factor", type=int, default=4)
    p.add_argument("--replicate_reps", type=int, default=0,
                   help="re-run the winner reps x splits with CI stats")
    p.add_argument("--num_splits", type=int, default=2)
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_concurrent", type=int, default=1,
                   help="trials trained in parallel, pinned round-robin "
                        "onto the local devices (Ray-actors analog)")
    p.add_argument("--search", default="random",
                   choices=["random", "bayes"],
                   help="'bayes' proposes configs with TPE after a random "
                        "startup wave (the reference's AxSearch role)")
    p.add_argument("--checkpoint_dir", default=None,
                   help="make the sweep resumable: trial table + per-trial "
                        "model checkpoints persist here")
    args = p.parse_args(argv)

    from graphax.data import get_dataset
    from graphax.train import Config, Trainer
    from graphax.train.sweep import asha_sweep, replicate_best

    base = Config(dataset=args.dataset, method="dopri5", tol_scale=100.0,
                  max_nfe=1000, no_early=True, self_loop_weight=1.0)
    data = get_dataset(base, data_dir=args.data_dir)

    out = asha_sweep(lambda cfg: Trainer(cfg, data), base,
                     num_samples=args.num_samples,
                     max_epochs=args.max_epochs,
                     grace_period=args.grace_period,
                     reduction_factor=args.reduction_factor,
                     seed=args.seed, verbose=True,
                     max_concurrent=args.max_concurrent,
                     search=args.search,
                     checkpoint_dir=args.checkpoint_dir)
    print(json.dumps({"best_val": out["best_val"],
                      "best_test": out["best_test"],
                      "best_config": {k: v for k, v in
                                      out["best_config"].to_dict().items()
                                      if k in ("lr", "decay", "hidden_dim",
                                               "heads", "time", "tol_scale",
                                               "block", "attention_dim",
                                               "dropout", "input_dropout")}}))

    if args.replicate_reps > 0:
        def make_trainer(cfg, split_seed):
            d = get_dataset(cfg, data_dir=args.data_dir,
                            split_seed=12345 + split_seed)
            return Trainer(cfg, d)

        stats = replicate_best(make_trainer, out["best_config"],
                               reps=args.replicate_reps,
                               num_splits=args.num_splits,
                               epochs=args.max_epochs,
                               max_concurrent=args.max_concurrent)
        print(json.dumps({"replication": {"val": stats["val"],
                                          "test": stats["test"]}}))


if __name__ == "__main__":
    main()
