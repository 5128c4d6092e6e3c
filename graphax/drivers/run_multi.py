"""Multimodal / pixel-grid training driver — `python -m graphax.drivers.run_multi`.

Twin of `src/run_multi.py`: MNIST/CIFAR images become grid graphs and
diffuse under the GNN_multimodal model (`src/GNN_multi.py`); the CLEVR-style
path trains VQA with cross-modal attention (question features as the second
modality inside the ODE function). Batched via the model's vmap path and
optionally data-parallel over a mesh."""

from __future__ import annotations

import argparse
import json
import time


def train_image_dataset(name: str = "MNIST", epochs: int = 2,
                        batch_size: int = 4, train_size: int = 32,
                        test_size: int = 16, data_dir: str = "./data",
                        log: bool = True, seed: int = 0,
                        dp_devices: int = 0) -> dict:
    """``dp_devices > 0``: replicated-model data parallelism over a 'data'
    mesh with psum'd gradients (the `nn.DataParallel` replacement) — the
    batch splits across devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from graphax.data.multimodal import get_image_dataset, multimodal_config
    from graphax.models import make_multimodal_gnn

    cfg, extra = multimodal_config(name, method="euler", step_size=0.25)
    ds = get_image_dataset(name, data_dir=data_dir,
                           size=train_size + test_size,
                           diags=extra.get("diags", True),
                           self_loop_weight=cfg.self_loop_weight, seed=seed)
    n_pix = ds.height * ds.width
    chan = ds.x.shape[-1]
    model = make_multimodal_gnn(cfg, num_nodes=n_pix, num_features=chan,
                                num_classes=ds.num_classes)
    params = model.init(jax.random.PRNGKey(seed))
    tx = optax.rmsprop(cfg.lr, decay=0.99)
    opt_state = tx.init(params)

    xs_train, ys_train = ds.x[:train_size], ds.y[:train_size]
    xs_test, ys_test = ds.x[train_size:], ds.y[train_size:]
    graph = ds.graph

    if dp_devices:
        from graphax.dist import make_dp_train_step, make_mesh

        mesh = make_mesh((dp_devices,), ("data",))
        assert batch_size % dp_devices == 0, \
            "batch_size must divide over dp_devices"

        def dp_loss(p, batch, rng):
            xb, yb = batch
            logits, _ = model.apply_batched(p, graph, xb, train=True,
                                            rng=rng)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(len(yb)), yb])

        dp_step = make_dp_train_step(mesh, dp_loss, tx)

        def step(params, opt_state, xb, yb, rng):
            return dp_step(params, opt_state, (xb, yb), rng)
    else:
        @jax.jit
        def step(params, opt_state, xb, yb, rng):
            def loss_fn(p):
                logits, _ = model.apply_batched(p, graph, xb, train=True,
                                                rng=rng)
                logp = jax.nn.log_softmax(logits)
                return -jnp.mean(logp[jnp.arange(len(yb)), yb])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, xb, yb):
        logits, _ = model.apply_batched(params, graph, xb, train=False)
        return jnp.mean(jnp.argmax(logits, -1) == yb)

    rng = jax.random.PRNGKey(seed + 1)
    history = []
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        losses = []
        for xb, yb in ds.batches(batch_size, seed=epoch):
            if len(losses) * batch_size >= train_size:
                break
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(xb), jnp.asarray(yb),
                                           sub)
            # keep losses on device: a float() per batch would force a
            # host sync every step and serialize dispatches
            losses.append(loss)
        losses = [float(np.ravel(v)[0]) for v in jax.device_get(losses)]
        acc = float(accuracy(params, jnp.asarray(xs_test),
                             jnp.asarray(ys_test)))
        history.append(dict(epoch=epoch, loss=float(np.mean(losses)),
                            test_acc=acc, time=time.time() - t0))
        if log:
            h = history[-1]
            print(f"[{name}] epoch {epoch} loss {h['loss']:.4f} "
                  f"test_acc {acc:.4f} ({h['time']:.1f}s)")
    return {"history": history, "params": params,
            "final_test_acc": history[-1]["test_acc"]}


def train_clevr_style(epochs: int = 2, batch_size: int = 4,
                      num_samples: int = 32, cache_path=None,
                      data_dir=None, log: bool = True, seed: int = 0,
                      real_clevr: bool = False, split: str = "train",
                      build_kwargs=None) -> dict:
    """CLEVR-style VQA: grid-graph diffusion over image features with
    cross-modal attention against the question tokens (multi_modal path of
    every ODE function). ``real_clevr=True`` trains on the staged
    CLEVR_v1.0 split (graphax.data.clevr zip→HDF5 ingestion) instead of
    the synthetic stand-in."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from graphax.data.multimodal import build_clevr_style_dataset
    from graphax.models import make_multimodal_gnn
    from graphax.train.config import Config

    if real_clevr:
        from graphax.data.clevr import load_clevr

        ds = load_clevr(data_dir, split=split, build_kwargs=build_kwargs)
    else:
        ds = build_clevr_style_dataset(num_samples=num_samples,
                                       cache_path=cache_path,
                                       data_dir=data_dir, seed=seed)
    feat_dim = ds.images.shape[-1]
    text_dim = ds.questions.shape[-1]
    cfg = Config(multi_modal=True, second_modality_dim=text_dim,
                 method="euler", step_size=0.5, time=1.0,
                 self_loop_weight=1.0, input_dropout=0.1, dropout=0.1,
                 lr=0.005)
    model = make_multimodal_gnn(cfg, num_nodes=ds.images.shape[1],
                                num_features=feat_dim,
                                num_classes=ds.num_classes)
    params = model.init(jax.random.PRNGKey(seed))
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    graph = ds.image_graph

    @jax.jit
    def step(params, opt_state, xb, qb, yb, rng):
        def loss_fn(p):
            logits, _ = model.apply_batched(p, graph, xb, train=True,
                                            rng=rng, x2s=qb)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(len(yb)), yb])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    rng = jax.random.PRNGKey(seed + 1)
    for epoch in range(1, epochs + 1):
        losses = []
        for xb, qb, yb, _sel in ds.batches(batch_size, seed=epoch):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(xb), jnp.asarray(qb),
                jnp.asarray(yb), sub)
            losses.append(loss)
        losses = jax.device_get(losses)
        history.append(dict(epoch=epoch, loss=float(np.mean(losses))))
        if log:
            print(f"[CLEVR-style] epoch {epoch} loss "
                  f"{history[-1]['loss']:.4f}")
    return {"history": history, "params": params}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--im_dataset", default="MNIST",
                   choices=["MNIST", "CIFAR", "CLEVR"])
    p.add_argument("--epoch", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--train_size", type=int, default=32)
    p.add_argument("--test_size", type=int, default=16)
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--dp_devices", type=int, default=0)
    p.add_argument("--real_clevr", action="store_true",
                   help="train on the staged CLEVR_v1.0 raw data "
                        "(scripts/fetch_data.py --only clevr) instead of "
                        "the synthetic stand-in")
    args = p.parse_args(argv)
    if args.im_dataset == "CLEVR":
        out = train_clevr_style(epochs=args.epoch,
                                batch_size=args.batch_size,
                                num_samples=args.train_size,
                                data_dir=args.data_dir,
                                real_clevr=args.real_clevr)
    else:
        out = train_image_dataset(args.im_dataset, epochs=args.epoch,
                                  batch_size=args.batch_size,
                                  train_size=args.train_size,
                                  test_size=args.test_size,
                                  data_dir=args.data_dir,
                                  dp_devices=args.dp_devices)
    print(json.dumps({"history": out["history"]}))
    return out


if __name__ == "__main__":
    main()
