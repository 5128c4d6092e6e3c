"""Solver-comparison harness — `src/run_explicit_implicit_exp.py`.

Trains the same GRAND config under different integrators / step sizes and
records per-epoch (time, loss, NFE, train/val/test acc), pickling one
results dict per (dataset, method, step size, run) exactly like the
reference (`:159-216`)."""

from __future__ import annotations

import argparse
import os
import pickle
import time


def run_experiment(dataset: str = "Cora",
                   methods=("euler", "rk4", "dopri5", "explicit_adams",
                            "implicit_adams"),
                   step_sizes=(1.0, 0.5, 0.25), runs: int = 1,
                   epochs: int = 20, results_dir: str = "./results",
                   data_dir: str = "./data", base_overrides=None) -> dict:
    from graphax.data import get_dataset
    from graphax.train import Config, Trainer

    os.makedirs(results_dir, exist_ok=True)
    all_results = {}
    base = dict(dataset=dataset, hidden_dim=32, block="constant",
                function="laplacian", time=3.0, self_loop_weight=1.0,
                lr=0.01, decay=5e-4, no_early=True, max_nfe=2000,
                tol_scale=100.0)
    base.update(base_overrides or {})
    data = get_dataset(dataset, data_dir=data_dir)

    for method in methods:
        fixed = method in ("euler", "rk4", "midpoint", "explicit_adams",
                           "implicit_adams")
        sizes = step_sizes if fixed else (1.0,)
        for dt in sizes:
            for run in range(runs):
                cfg = Config(**base, method=method, step_size=dt)
                trainer = Trainer(cfg, data)
                out = trainer.fit(epochs=epochs, seed=run)
                rec = {
                    "epochs": [h["epoch"] for h in out["history"]],
                    "times": [h["time"] for h in out["history"]],
                    "losses": [h["loss"] for h in out["history"]],
                    "nfes": [h["nfe"] for h in out["history"]],
                    "train_accs": [h["train_acc"] for h in out["history"]],
                    "val_accs": [h["val_acc"] for h in out["history"]],
                    "test_accs": [h["test_acc"] for h in out["history"]],
                    "best": out["best"],
                }
                fname = os.path.join(
                    results_dir,
                    f"{dataset}_{method}_stepsize_{dt}_run_{run}.pickle")
                with open(fname, "wb") as f:
                    pickle.dump(rec, f)
                all_results[(method, dt, run)] = rec
                print(f"{method} dt={dt} run={run}: best val "
                      f"{out['best']['val_acc']:.4f} "
                      f"(avg nfe {sum(rec['nfes'])/len(rec['nfes']):.0f})")
    return all_results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--results_dir", default="./results")
    args = p.parse_args(argv)
    run_experiment(args.dataset, epochs=args.epochs, runs=args.runs,
                   results_dir=args.results_dir)


if __name__ == "__main__":
    main()
