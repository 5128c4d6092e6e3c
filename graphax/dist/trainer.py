"""DistTrainer — the Trainer-compatible epoch loop over the sharded model.

This is how `Config.mesh_shape` comes alive: `drivers/run_gnn.py` (and any
user code) constructs DistTrainer when ``prod(cfg.mesh_shape) > 1`` and gets
the same `fit()` contract as `graphax.train.loop.Trainer` — per-epoch train
step, (early-stop) evaluation, best-val tracking, checkpointing — with the
node state sharded over the mesh's 'graph' axis and one halo all_to_all per
RHS evaluation (graphax.dist.model). Params/opt-state are replicated, so the
Trainer's npz checkpoints are interchangeable between 1 and N chips.
"""

from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphax.data.container import GraphData
from graphax.dist.mesh import make_mesh
from graphax.dist.model import make_sharded_gnn, normalized_partition
from graphax.dist.partition import shard_nodes, unshard_nodes
from graphax.train.loop import Meter, TrainState, add_labels


class DistTrainer:
    """Multi-chip twin of `graphax.train.loop.Trainer` (same fit loop as
    `run_GNN.py:249-275`). The graph axis size comes from cfg.mesh_shape;
    partitioning uses the native BFS community partitioner by default."""

    def __init__(self, cfg, data: GraphData, mesh=None,
                 partition_method: str = "bfs", local_tiles="auto"):
        self.cfg = cfg
        self.data = data
        self._partition_method = partition_method
        self._local_tiles = local_tiles
        n_graph = int(np.prod(cfg.mesh_shape))
        n_slices = 1
        if mesh is None and jax.process_count() > 1:
            # multi-host: graph axis over the GLOBAL devices, DCN outermost;
            # partition parts ordered so high-cut pairs share a slice
            from graphax.dist.multihost import global_mesh, num_slices

            mesh = global_mesh(graph_shards=n_graph,
                               axis_names=("graph",))
            n_slices = num_slices()
        self.mesh = mesh or make_mesh((n_graph,), ("graph",))
        try:
            self.part = normalized_partition(cfg, data.graph, n_graph,
                                             method=partition_method,
                                             num_slices=n_slices)
        except Exception:
            self.part = normalized_partition(cfg, data.graph, n_graph)
        self.model = make_sharded_gnn(self.mesh, self.part, cfg,
                                      data.num_features, data.num_classes,
                                      local_tiles=local_tiles)
        from graphax.train.optimizers import get_optimizer

        self.tx = get_optimizer(cfg.optimizer, cfg.lr, cfg.decay)
        self.fm, self.bm = Meter(), Meter()
        self._shard_static()

    def _feed(self, stacked):
        """Device placement for a [P, ...] stacked array: plain asarray on
        one process, per-process-slice feeding on multi-host (each process
        materializes only its own shards — graphax.dist.multihost)."""
        if jax.process_count() > 1:
            from graphax.dist.multihost import feed_process_local

            return feed_process_local(np.asarray(stacked), self.mesh)
        return jnp.asarray(stacked)

    def _shard_static(self):
        data, part = self.data, self.part
        sh = lambda a: self._feed(shard_nodes(np.asarray(a), part))
        shm = lambda m: self._feed(shard_nodes(
            np.asarray(m)[:, None].astype(np.float32),
            part)[..., 0] > 0.5)
        self.ys = self._feed(shard_nodes(
            np.asarray(data.y)[:, None], part)[..., 0].astype(np.int32))
        self.m_tr = shm(data.train_mask)
        self.m_va = shm(data.val_mask)
        self.m_te = shm(data.test_mask)
        self.pos = (sh(data.pos_encoding)
                    if data.pos_encoding is not None else None)
        self._x_base = np.asarray(data.x)

    def _features(self, rng, train: bool):
        """Label trick host-side (cheap N×C work), then shard — mirrors
        Trainer._prepare_features / `run_GNN.py:39-59`."""
        cfg, data = self.cfg, self.data
        feat = self._x_base
        if cfg.use_labels:
            if train and rng is not None:
                coin = jax.random.uniform(rng, data.train_mask.shape) \
                    < cfg.label_rate
                label_mask = np.asarray(data.train_mask) & np.asarray(coin)
            else:
                label_mask = np.asarray(data.train_mask)
            feat = np.asarray(add_labels(
                jnp.asarray(feat), jnp.asarray(data.y),
                jnp.asarray(label_mask), data.num_classes))
        return self._feed(shard_nodes(feat, self.part))

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        k1, k2 = jax.random.split(rng)
        params, model_state = self.model.init(k1)
        return TrainState(params=params, model_state=model_state,
                          opt_state=self.tx.init(params), rng=k2)

    def train_step(self, state: TrainState):
        rng, rng_labels, rng_model = jax.random.split(state.rng, 3)
        xs = self._features(rng_labels, train=True)
        params, mstate, opt_state, loss, nfe = self.model.train_step(
            state.params, state.model_state, state.opt_state, xs, self.ys,
            self.m_tr, rng_model, pos=self.pos)
        loss = float(np.ravel(np.asarray(loss))[0])
        nfe = int(np.ravel(np.asarray(nfe))[0])
        self.fm.update(nfe)
        if self.cfg.adjoint:
            from graphax.ode import last_adjoint_bwd_nfe

            self.bm.update(last_adjoint_bwd_nfe())
        else:
            self.bm.update(nfe)
        return TrainState(params, mstate, opt_state, rng), loss

    def evaluate(self, state: TrainState):
        xs = self._features(None, train=False)
        accs = self.model.eval_accs(state.params, state.model_state, xs,
                                    self.ys, self.m_tr, self.m_va, self.m_te,
                                    pos=self.pos)
        accs = np.ravel(np.asarray(accs))
        return float(accs[0]), float(accs[1]), float(accs[2])

    def evaluate_early(self, state: TrainState) -> Dict[str, float]:
        xs = self._features(None, train=False)
        out = self.model.eval_early(state.params, state.model_state, xs,
                                    self.ys, self.m_tr, self.m_va, self.m_te,
                                    pos=self.pos)
        return {k: float(v) for k, v in out.items()}

    # ------------------------------------------------------------------
    # epoch-boundary graph rewiring (BLEND graph evolution, sharded —
    # `run_GNN.py:252-254` / `graph_rewiring.py:151-161`)
    # ------------------------------------------------------------------

    def _embeddings(self, state: TrainState, mode: str) -> np.ndarray:
        """[N, D] host embeddings for kNN: raw features, the sharded
        encoder output (T0), or the sharded encoder+solve output (TN)."""
        if mode == "raw":
            return np.asarray(self.data.x)
        if mode not in ("T0", "TN"):
            raise ValueError(f"rewire_KNN_T must be raw|T0|TN, got {mode!r}")
        xs = self._features(None, train=False)
        zs = self.model.internals["forward_embed"](
            state.params, state.model_state, xs, mode, pos=self.pos)
        return unshard_nodes(np.asarray(jax.device_get(zs)), self.part)

    def rewire_knn(self, state: TrainState):
        """kNN-rewire the dataset graph (`rewire_KNN_epoch` epochs): embed
        (sharded), build the SAME edge set as the single-chip
        `apply_knn` (host-side `knn_graph` on the unsharded embeddings),
        then re-partition and swap the rebuilt tables into the
        already-compiled step — warm jit caches when the static caps hold
        (SURVEY §7.3 hard part 5)."""
        from graphax.rewiring.knn import knn_graph, rewire_graph_with_edges

        cfg = self.cfg
        z = self._embeddings(state, cfg.rewire_KNN_T)
        row, col = knn_graph(z, cfg.rewire_KNN_k, sym=cfg.rewire_KNN_sym)
        new_graph = rewire_graph_with_edges(
            self.data.graph, row, col,
            self_loop_weight=cfg.self_loop_weight)
        self.swap_graph(new_graph)

    def swap_graph(self, new_graph):
        """Re-partition for a new topology. Fast path: pad the new
        partition to the previous static caps and swap the rebuilt tables
        in as new jit-argument values (`internals['set_tables']`) — the
        compiled train/eval steps are reused as-is. If any cap grew, fall
        back to a full model rebuild (one recompile; subsequent rewires at
        the grown caps are warm again)."""
        import dataclasses

        from graphax.dist.partition import pad_partition

        self.data = dataclasses.replace(self.data, graph=new_graph)
        try:
            npart = normalized_partition(self.cfg, new_graph,
                                         self.part.num_shards,
                                         method=self._partition_method)
        except Exception:
            npart = normalized_partition(self.cfg, new_graph,
                                         self.part.num_shards)
        npart = pad_partition(npart, es=self.part.local_row.shape[1],
                              h=self.part.halo_size, hp=self.part.pair_size)
        swapped = False
        if npart.block_size == self.part.block_size:
            try:
                tables = self.model.internals["build_tables"](npart)
                swapped = self.model.internals["set_tables"](tables)
            except Exception:
                swapped = False
        if not swapped:
            self.model = make_sharded_gnn(
                self.mesh, npart, self.cfg, self.data.num_features,
                self.data.num_classes, local_tiles=self._local_tiles)
        self.part = npart
        self.last_swap_was_warm = swapped
        self._shard_static()

    def fit(self, epochs: Optional[int] = None, log_every: int = 0,
            use_early_stop: Optional[bool] = None,
            seed: Optional[int] = None,
            checkpoint_path: Optional[str] = None,
            checkpoint_every: int = 10) -> Dict[str, Any]:
        """Same contract as `Trainer.fit` including checkpoint/resume:
        params/opt-state are replicated over the mesh, so the npz
        checkpoints are byte-compatible with the single-chip Trainer's —
        a run can stop on 1 chip and resume on N (or vice versa)."""
        cfg = self.cfg
        epochs = cfg.epoch if epochs is None else epochs
        if use_early_stop is None:
            use_early_stop = not cfg.no_early
        state = self.init_state(seed)
        best = {"val_acc": 0.0, "test_acc": 0.0, "train_acc": 0.0,
                "epoch": 0, "best_time": 0.0}
        history = []
        start_epoch = 1
        if checkpoint_path is not None:
            resumed = self._try_resume(checkpoint_path, state)
            if resumed is not None:
                state, best, start_epoch = resumed
        for epoch in range(start_epoch, epochs + 1):
            t0 = time.time()
            if cfg.rewire_KNN and epoch % cfg.rewire_KNN_epoch == 0:
                self.rewire_knn(state)
            state, loss = self.train_step(state)
            if use_early_stop:
                res = self.evaluate_early(state)
                train_acc, val_acc, test_acc = (res["best_train"],
                                                res["best_val"],
                                                res["best_test"])
                best_time = res["best_time"]
            else:
                train_acc, val_acc, test_acc = self.evaluate(state)
                best_time = cfg.time
            if val_acc > best["val_acc"]:
                best.update(val_acc=val_acc, test_acc=test_acc,
                            train_acc=train_acc, epoch=epoch,
                            best_time=best_time)
            history.append(dict(epoch=epoch, loss=loss, train_acc=train_acc,
                                val_acc=val_acc, test_acc=test_acc,
                                time=time.time() - t0,
                                nfe=self.fm.get_value()))
            if log_every and epoch % log_every == 0:
                h = history[-1]
                print(f"Epoch {epoch:4d} | shards "
                      f"{self.part.num_shards} | time {h['time']:.3f}s | "
                      f"loss {loss:.4f} | nfe {h['nfe']} | val "
                      f"{val_acc:.4f} | best val {best['val_acc']:.4f}")
            if checkpoint_path is not None and \
                    epoch % checkpoint_every == 0:
                self._save_ckpt(checkpoint_path, state, best, epoch)
        if checkpoint_path is not None:
            self._save_ckpt(checkpoint_path, state, best, epochs)
        return {"best": best, "history": history, "state": state}

    # checkpoint format identical to Trainer's (`train/loop.py::_save_ckpt`)
    def _save_ckpt(self, path, state: TrainState, best, epoch: int):
        from graphax.train.checkpoint import save_checkpoint

        save_checkpoint(path, {
            "params": state.params, "model_state": state.model_state,
            "opt_state": state.opt_state, "rng": state.rng,
            "best": {k: jnp.asarray(v) for k, v in best.items()},
            "epoch": jnp.asarray(epoch),
        })

    def _try_resume(self, path, template_state: TrainState):
        import os

        from graphax.train.checkpoint import load_checkpoint

        p = path if path.endswith(".npz") else path + ".npz"
        if not os.path.exists(p):
            return None
        tpl = {
            "params": template_state.params,
            "model_state": template_state.model_state,
            "opt_state": template_state.opt_state,
            "rng": template_state.rng,
            "best": {"val_acc": 0.0, "test_acc": 0.0, "train_acc": 0.0,
                     "epoch": 0, "best_time": 0.0},
            "epoch": 0,
        }
        ck = load_checkpoint(p, like=tpl)
        state = TrainState(params=ck["params"],
                           model_state=ck["model_state"],
                           opt_state=ck["opt_state"], rng=ck["rng"])
        best = {k: float(v) for k, v in ck["best"].items()}
        best["epoch"] = int(best["epoch"])
        return state, best, int(ck["epoch"]) + 1
