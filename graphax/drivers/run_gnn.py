"""Canonical node-classification CLI — `python -m graphax.drivers.run_gnn`.

Twin of `src/graph_datasets/run_GNN.py`: argparse over the full Config
schema, `best_params` merge with explicit-CLI precedence (`merge_cmd_args`,
`:190-212`), Beltrami positional encodings, model selection, num_splits
repetition with the seeded dev-split protocol and mean/sem/95%-CI reporting.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Optional

from graphax.train.config import Config


def build_parser() -> argparse.ArgumentParser:
    """Argparse mirroring the reference flag surface; flags default to
    SUPPRESS so only explicitly-passed ones override best_params."""
    p = argparse.ArgumentParser(description="graphax GRAND/BLEND trainer")
    p.add_argument("--use_best_params", action="store_true",
                   help="merge the tuned registry config for the dataset")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--synthetic_fallback", action="store_true", default=True)
    p.add_argument("--mesh_shape", type=str, default=argparse.SUPPRESS,
                   help="comma-separated graph-axis mesh, e.g. '4' or '8' — "
                        ">1 routes training through the sharded DistTrainer")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize from "
                        "GRAPHAX_COORDINATOR/GRAPHAX_NUM_PROC/GRAPHAX_"
                        "PROC_ID (or an auto-detected launcher), then run "
                        "the DistTrainer over the global DCN-outer mesh "
                        "(graphax.dist.multihost)")
    for f in dataclasses.fields(Config):
        if f.name in ("mesh_shape", "mesh_axes"):
            continue
        arg = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(arg, type=lambda v: v.lower() in ("1", "true"),
                           default=argparse.SUPPRESS)
        elif isinstance(f.default, int) and not isinstance(f.default, bool):
            p.add_argument(arg, type=int, default=argparse.SUPPRESS)
        elif isinstance(f.default, float):
            p.add_argument(arg, type=float, default=argparse.SUPPRESS)
        else:
            p.add_argument(arg, type=str, default=argparse.SUPPRESS)
    return p


def config_from_args(args) -> Config:
    explicit = {k: v for k, v in vars(args).items()
                if k not in ("use_best_params", "data_dir", "log_every",
                             "synthetic_fallback", "distributed")}
    if isinstance(explicit.get("mesh_shape"), str):
        explicit["mesh_shape"] = tuple(
            int(s) for s in explicit["mesh_shape"].split(",") if s)
    dataset = explicit.get("dataset", "Cora")
    if args.use_best_params:
        from graphax.train.presets import BEST_PARAMS

        base = dict(BEST_PARAMS.get(dataset, {}))
        base.update(explicit)          # explicit CLI wins (merge_cmd_args)
        return Config.from_dict(base)
    return Config.from_dict(explicit)


def run(cfg: Config, data_dir: str = "./data", log_every: int = 10,
        num_splits: Optional[int] = None) -> dict:
    import numpy as np

    from graphax.data import get_dataset
    from graphax.train import Trainer
    from graphax.utils.stats import summarize_runs

    splits = num_splits or cfg.num_splits
    val_accs, test_accs = [], []
    for split in range(splits):
        data = get_dataset(cfg, data_dir=data_dir,
                           split_seed=12345 + split)
        if cfg.beltrami:
            from graphax.rewiring import apply_beltrami

            enc = apply_beltrami(data, cfg, cache_dir=data_dir)
            cfg = cfg.replace(pos_enc_dim=int(enc.shape[1]))
            data = data.with_pos_encoding(enc)
        if cfg.rewiring == "two_hop":
            from graphax.rewiring import apply_two_hop_rewiring

            data = apply_two_hop_rewiring(data, cfg)
        elif cfg.rewiring == "gdc":
            from graphax.rewiring import apply_gdc_rewiring

            data = apply_gdc_rewiring(data, cfg)
        if cfg.community_window:
            # after rewiring, so the windowed layout matches the final
            # topology (runtime rewiring drops back to the tiled path)
            from graphax.data import community_reorder

            data = community_reorder(data, window=cfg.community_window)

        if int(np.prod(cfg.mesh_shape)) > 1:
            # cfg.mesh_shape > 1 chip: node-sharded training over the mesh
            # (graphax.dist.DistTrainer, same fit contract)
            from graphax.dist import DistTrainer

            trainer = DistTrainer(cfg, data)
        else:
            trainer = Trainer(cfg, data)
        out = trainer.fit(log_every=log_every, seed=split)
        val_accs.append(out["best"]["val_acc"])
        test_accs.append(out["best"]["test_acc"])
        print(f"split {split}: best val {val_accs[-1]:.4f} "
              f"test {test_accs[-1]:.4f}")

    summary = {"val": summarize_runs(val_accs),
               "test": summarize_runs(test_accs)}
    print(json.dumps(summary))
    return summary


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "distributed", False):
        from graphax.dist.multihost import init_distributed

        nproc, pid = init_distributed()
        print(f"distributed: process {pid}/{nproc}")
    cfg = config_from_args(args)
    return run(cfg, data_dir=args.data_dir, log_every=args.log_every)


if __name__ == "__main__":
    main()
