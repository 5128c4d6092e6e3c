"""Training and evaluation loops.

Twin of the canonical driver (`src/graph_datasets/run_GNN.py:62-275`): jitted
train step with cross-entropy (+ regularizer loss Σ coeff·mean(reg_state)),
the label trick (`get_label_masks`/`add_labels`, `:39-59`), NFE meters
sampled around forward/backward, per-epoch val/test accuracy, best-val
tracking that also consults the early-stop solver's internal best
(`:259-271`), and optional periodic kNN rewiring."""

from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphax.data.container import GraphData
from graphax.models import make_gnn, make_gnn_knn
from graphax.models.early import evaluate_early_stop, masked_accuracy
from graphax.train.optimizers import get_optimizer


class Meter:
    """Forward/backward NFE accumulator (`src/utils.py:281-302`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val, self.sum, self.cnt = None, 0, 0

    def update(self, val):
        self.val = val
        self.sum += val
        self.cnt += 1

    def get_average(self):
        return 0 if self.cnt == 0 else self.sum / self.cnt

    def get_value(self):
        return self.val


def add_labels(feat, labels, mask, num_classes: int):
    """Append one-hot labels for masked nodes, zeros elsewhere
    (`run_GNN.py:39-45`)."""
    onehot = jax.nn.one_hot(labels, num_classes) * mask[:, None]
    return jnp.concatenate([feat, onehot], axis=-1)


def get_label_masks(rng, train_mask, label_rate: float = 0.5):
    """Split train nodes into label-carrying vs prediction nodes
    (`run_GNN.py:48-59`)."""
    coin = jax.random.uniform(rng, train_mask.shape) < label_rate
    label_mask = train_mask & coin
    pred_mask = train_mask & ~coin
    return label_mask, pred_mask


def cross_entropy_loss(logits, labels, mask, use_nll: bool = False):
    """CE over masked nodes; the arxiv path applies log_softmax then nll —
    numerically identical, kept for parity (`run_GNN.py:75-80`)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_node = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    per_node = jnp.where(mask, per_node, 0.0)
    return jnp.sum(per_node) / jnp.maximum(jnp.sum(mask), 1)


class TrainState(NamedTuple):
    params: Any
    model_state: Any
    opt_state: Any
    rng: Any


class Trainer:
    """Stateful convenience wrapper around the pure jitted step functions.

    ``split_step``: compile the train step as THREE jits (encoder forward →
    solve+decode gradient with the encoder output as an ARGUMENT → encoder
    backward) instead of one. Mathematically identical (hand-chained
    cotangents; pinned by ``test_train.py::test_split_step_matches_fused``)
    but it reliably lands the fast compiler schedule on the axon TPU
    backend: the single fused jit deterministically compiles into a ~2.2x
    slower program whenever the solve's initial state is produced by the
    encoder inside the same program (bisected in SCALING.md r5 — same
    flops/bytes per cost_analysis, scheduling only). "auto" = on for TPU
    training at ≥500k edges; forced True/False otherwise."""

    def __init__(self, cfg, data: GraphData, jit: bool = True,
                 split_step="auto"):
        self.cfg = cfg
        if cfg.community_window and data.graph.strategy != "windowed":
            # route the solve through the block-dense windowed layout on
            # community-ordered node ids (graphax.data.community_reorder);
            # falls back to the tiled layout on graphs without community
            # structure (in-window fraction too low to beat the gather path)
            from graphax.data import community_reorder

            data = community_reorder(data, window=cfg.community_window,
                                     min_in_window_frac=0.35)
        # hoist the per-forward weight normalization (`reset_graph_data`)
        # to init time: weights are static between topology changes, and
        # at ogbn-arxiv scale the in-solve normalization costs 31 ms per
        # forward (the sharded model hoists identically at partition time;
        # rewiring re-normalizes in _swap_graph)
        import dataclasses as _dc

        from graphax.blocks.common import normalize_graph

        data = _dc.replace(
            data, graph=_dc.replace(normalize_graph(cfg, data.graph),
                                    pre_normalized=True))
        self.data = data
        # model selection mirrors `run_GNN.py:232-235`: the KNN-rewiring /
        # fa-layer variant when those flags are set, plain GNN otherwise
        maker = make_gnn_knn if (cfg.rewire_KNN or cfg.fa_layer) else make_gnn
        self.model = maker(cfg, num_features=data.num_features,
                           num_classes=data.num_classes)
        self.tx = get_optimizer(cfg.optimizer, cfg.lr, cfg.decay)
        self.fm, self.bm = Meter(), Meter()
        self._jit = jit
        if split_step == "auto":
            split_step = (jit and jax.default_backend() == "tpu"
                          and not cfg.fa_layer
                          and int(data.graph.num_edges) >= 500_000)
        self._split = bool(split_step)
        self._train_step = jax.jit(self._train_step_impl) if jit \
            else self._train_step_impl
        if self._split:
            self._enc_fwd_j = jax.jit(self._enc_fwd_impl)
            self._solve_grad_j = jax.jit(self._solve_grad_impl)
            self._enc_bwd_j = jax.jit(self._enc_bwd_impl)
            self._apply_updates_j = jax.jit(self._apply_updates_impl)
        self._eval = jax.jit(self._eval_impl) if jit else self._eval_impl
        self._eval_early = jax.jit(self._eval_early_impl) if jit \
            else self._eval_early_impl

    # -- pure steps ----------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        k1, k2 = jax.random.split(rng)
        params, model_state = self.model.init(k1)
        return TrainState(params=params, model_state=model_state,
                          opt_state=self.tx.init(params), rng=k2)

    def _prepare_features(self, rng, train: bool, data=None):
        cfg = self.cfg
        data = self.data if data is None else data
        feat = data.x
        loss_mask = data.train_mask
        if cfg.use_labels:
            if train:
                label_mask, pred_mask = get_label_masks(rng, data.train_mask,
                                                        cfg.label_rate)
                # reference quirk: loss still uses the FULL train mask
                # (`run_GNN.py:75-80` uses data.train_mask, not pred_idx)
            else:
                label_mask = data.train_mask
            feat = add_labels(feat, data.y, label_mask, data.num_classes)
        return feat, loss_mask

    def _train_step_impl(self, state: TrainState, data: GraphData):
        # `data` is a jit ARGUMENT (not a closure): closures bake node
        # features into the compiled program as constants — a 500MB upload
        # for CoauthorCS-sized feature matrices
        cfg = self.cfg
        rng, rng_labels, rng_model = jax.random.split(state.rng, 3)

        def loss_fn(params):
            feat, loss_mask = self._prepare_features(rng_labels, train=True,
                                                     data=data)
            logits, new_model_state, aux = self.model.apply(
                params, state.model_state, data.graph, feat, train=True,
                rng=rng_model, pos_encoding=data.pos_encoding)
            loss = cross_entropy_loss(logits, data.y, loss_mask,
                                      use_nll=cfg.dataset == "ogbn-arxiv")
            for rs, (_, coeff) in zip(aux["reg_states"], cfg.reg_coeffs()):
                loss = loss + coeff * jnp.mean(rs)
            return loss, (new_model_state, aux)

        (loss, (model_state, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return TrainState(params, model_state, opt_state, rng), loss, aux

    # -- split train step (axon scheduler workaround, SCALING.md r5) ---

    @staticmethod
    def _step_rngs(rng_model):
        """Replicate model.apply's rng consumption exactly so split and
        fused trajectories agree even with dropout on: apply splits
        rng → (r1, r2); forward_ode splits r1 → (enc_rng, _); decode
        uses r2."""
        r1, r2 = jax.random.split(rng_model)
        enc_rng, _ = jax.random.split(r1)
        return enc_rng, r2

    def _enc_fwd_impl(self, params, model_state, data, rng_labels, enc_rng):
        feat, loss_mask = self._prepare_features(rng_labels, True, data)
        x0, new_state = self.model.encode(params, model_state, feat,
                                          train=True, rng=enc_rng,
                                          pos_encoding=data.pos_encoding)
        return x0, new_state, loss_mask

    def _solve_grad_impl(self, params, data, x0, loss_mask, dec_rng):
        cfg = self.cfg
        ode_dtype = jnp.dtype(cfg.dtype)

        def loss_fn(p, z_in):
            out = self.model.block.forward(p["block"], data.graph,
                                           z_in.astype(ode_dtype),
                                           train=True)
            z = out.z
            if z.dtype != z_in.dtype:
                z = z.astype(z_in.dtype)
            logits = self.model.decode(p, z, train=True, rng=dec_rng)
            loss = cross_entropy_loss(logits, data.y, loss_mask,
                                      use_nll=cfg.dataset == "ogbn-arxiv")
            for rs, (_, coeff) in zip(out.reg_states, cfg.reg_coeffs()):
                loss = loss + coeff * jnp.mean(rs)
            return loss, {"nfe": out.result.nfe,
                          "steps": out.result.steps,
                          "success": out.result.success}

        (loss, aux), (gp, dx0) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, x0)
        return loss, aux, gp, dx0

    def _enc_bwd_impl(self, params, model_state, data, rng_labels, enc_rng,
                      dx0):
        feat, _ = self._prepare_features(rng_labels, True, data)

        def enc(p):
            x0, _ = self.model.encode(p, model_state, feat, train=True,
                                      rng=enc_rng,
                                      pos_encoding=data.pos_encoding)
            return x0

        _, vjp = jax.vjp(enc, params)
        return vjp(dx0)[0]

    def _apply_updates_impl(self, state: TrainState, grads_solve,
                            grads_enc):
        grads = jax.tree_util.tree_map(lambda a, b: a + b, grads_solve,
                                       grads_enc)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return params, opt_state

    def _train_step_split(self, state: TrainState):
        rng, rng_labels, rng_model = jax.random.split(state.rng, 3)
        enc_rng, dec_rng = self._step_rngs(rng_model)
        x0, model_state, loss_mask = self._enc_fwd_j(
            state.params, state.model_state, self.data, rng_labels, enc_rng)
        loss, aux, gp, dx0 = self._solve_grad_j(
            state.params, self.data, x0, loss_mask, dec_rng)
        genc = self._enc_bwd_j(state.params, state.model_state, self.data,
                               rng_labels, enc_rng, dx0)
        params, opt_state = self._apply_updates_j(state, gp, genc)
        return TrainState(params, model_state, opt_state, rng), loss, aux

    def _eval_impl(self, params, model_state, data: GraphData):
        feat, _ = self._prepare_features(None, train=False, data=data)
        logits, _, aux = self.model.apply(params, model_state, data.graph,
                                          feat, train=False,
                                          pos_encoding=data.pos_encoding)
        accs = tuple(masked_accuracy(logits, data.y, m) for m in
                     (data.train_mask, data.val_mask, data.test_mask))
        return accs, aux

    # -- epoch loop ----------------------------------------------------

    def _backward_nfe(self, fwd_nfe: int) -> int:
        """bm semantics (`run_GNN.py:90-95`): NFE incurred by the backward.
        Adjoint → the backward solve's own NFE (host-reported by
        `odeint_adjoint`); non-adjoint → the rematerialized forward evals
        (= fwd NFE: `jax.checkpoint` re-runs each accepted step once)."""
        if self.cfg.adjoint:
            from graphax.ode import last_adjoint_bwd_nfe

            return last_adjoint_bwd_nfe()
        return fwd_nfe

    def train_step(self, state: TrainState):
        if self._split:
            state, loss, aux = self._train_step_split(state)
        else:
            state, loss, aux = self._train_step(state, self.data)
        nfe = int(aux["nfe"])
        loss = float(loss)  # blocks: the adjoint bwd NFE callback has fired
        self.fm.update(nfe)
        self.bm.update(self._backward_nfe(nfe))
        return state, loss

    def evaluate(self, state: TrainState):
        accs, aux = self._eval(state.params, state.model_state, self.data)
        return tuple(float(a) for a in accs)

    def _eval_early_impl(self, params, model_state, data: GraphData):
        # jitted: the unjitted early-stop eval runs the whole adaptive solve
        # op-by-op — hundreds of per-op dispatches per epoch (each a full
        # tunnel round trip under axon)
        feat, _ = self._prepare_features(None, train=False, data=data)
        return evaluate_early_stop(
            self.cfg, self.model, params, model_state, data.graph,
            feat, data.y, data.train_mask, data.val_mask, data.test_mask,
            pos_encoding=data.pos_encoding)

    def evaluate_early(self, state: TrainState):
        return self._eval_early(state.params, state.model_state, self.data)

    def rewire_knn(self, state: TrainState):
        """kNN-rewire the dataset graph every `rewire_KNN_epoch` epochs
        (`run_GNN.py:252-254`). Rebuilds the jitted steps if the edge buffer
        grew."""
        from graphax.rewiring import apply_knn
        import dataclasses

        new_graph = apply_knn(self.cfg, self.model, state.params,
                              state.model_state, self.data)
        self._swap_graph(new_graph)

    def rewire_edge_sampling(self, state: TrainState):
        from graphax.rewiring import apply_edge_sampling

        new_graph = apply_edge_sampling(self.cfg, self.model, state.params,
                                        state.model_state, self.data)
        self._swap_graph(new_graph)

    def _swap_graph(self, new_graph):
        import dataclasses

        from graphax.blocks.common import normalize_graph

        # re-apply the hoisted normalization for the new topology
        new_graph = dataclasses.replace(
            normalize_graph(self.cfg, new_graph), pre_normalized=True)
        self.data = dataclasses.replace(self.data, graph=new_graph)
        self._train_step = jax.jit(self._train_step_impl) if self._jit \
            else self._train_step_impl
        self._eval = jax.jit(self._eval_impl) if self._jit \
            else self._eval_impl
        self._eval_early = jax.jit(self._eval_early_impl) if self._jit \
            else self._eval_early_impl

    def fit(self, epochs: Optional[int] = None, log_every: int = 0,
            use_early_stop: Optional[bool] = None, seed: Optional[int] = None,
            checkpoint_path: Optional[str] = None,
            checkpoint_every: int = 10) -> Dict[str, Any]:
        """The reference epoch loop (`run_GNN.py:249-275`): train, evaluate
        (optionally with the early-stop integrator), track best val/test.

        ``checkpoint_path``: save (params, opt state, epoch, best) every
        ``checkpoint_every`` epochs and auto-resume from an existing file —
        first-class checkpoint/resume (the reference only checkpoints inside
        Ray trainables, SURVEY §5.4)."""
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
            if cfg.edge_sampling and epoch % cfg.edge_sampling_epoch == 0:
                self.rewire_edge_sampling(state)
            # one host transfer per epoch: collect device scalars, then a
            # single device_get (each separate float()/int() pull pays a
            # full dispatch round trip under the axon tunnel)
            state, loss_d, aux = self._train_step(state, self.data)
            if use_early_stop:
                res = self._eval_early(state.params, state.model_state,
                                       self.data)
                pulled = jax.device_get((loss_d, aux["nfe"], res.best_train,
                                         res.best_val, res.best_test,
                                         res.best_time))
                loss, nfe, *tmp, best_time = (float(v) for v in pulled)
            else:
                accs, _ = self._eval(state.params, state.model_state,
                                     self.data)
                pulled = jax.device_get((loss_d, aux["nfe"]) + accs)
                loss, nfe, *tmp = (float(v) for v in pulled)
                best_time = cfg.time
            self.fm.update(int(nfe))
            self.bm.update(self._backward_nfe(int(nfe)))
            train_acc, val_acc, test_acc = tmp
            if val_acc > best["val_acc"]:
                best.update(val_acc=val_acc, test_acc=test_acc,
                            train_acc=train_acc, epoch=epoch,
                            best_time=best_time)
            history.append(dict(epoch=epoch, loss=loss,
                                train_acc=train_acc, val_acc=val_acc,
                                test_acc=test_acc,
                                time=time.time() - t0,
                                nfe=self.fm.get_value()))
            if log_every and epoch % log_every == 0:
                h = history[-1]
                print(f"Epoch {epoch:4d} | time {h['time']:.3f}s | loss "
                      f"{loss:.4f} | nfe {h['nfe']} | train {train_acc:.4f} "
                      f"| val {val_acc:.4f} | test {test_acc:.4f} | best "
                      f"val {best['val_acc']:.4f}")
            if checkpoint_path is not None and \
                    epoch % checkpoint_every == 0:
                self._save_ckpt(checkpoint_path, state, best, epoch)
        if checkpoint_path is not None:
            self._save_ckpt(checkpoint_path, state, best, epochs)
        return {"best": best, "history": history, "state": state}

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

        real = path if path.endswith(".npz") else path + ".npz"
        if not os.path.exists(real):
            return None
        like = {
            "params": template_state.params,
            "model_state": template_state.model_state,
            "opt_state": template_state.opt_state,
            "rng": template_state.rng,
            "best": {"val_acc": 0.0, "test_acc": 0.0, "train_acc": 0.0,
                     "epoch": 0, "best_time": 0.0},
            "epoch": 0,
        }
        tree = load_checkpoint(real, like=like)
        state = TrainState(params=tree["params"],
                           model_state=tree["model_state"],
                           opt_state=tree["opt_state"], rng=tree["rng"])
        best = {k: float(v) for k, v in tree["best"].items()}
        best["epoch"] = int(best["epoch"])
        return state, best, int(tree["epoch"]) + 1
