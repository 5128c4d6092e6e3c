"""CGNN (ICML'20) baseline driver — `src/CGNN.py`'s main/train/test loop."""

from __future__ import annotations

import argparse
import json


def train_cgnn(dataset: str = "Cora", epochs: int = 50, data_dir="./data",
               hidden_dim: int = 16, time: float = 1.0, lr: float = 0.01,
               log_every: int = 10, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from graphax.data import get_dataset
    from graphax.models import make_cgnn
    from graphax.models.cgnn import normalize_for_cgnn
    from graphax.models.early import masked_accuracy
    from graphax.train import Config

    cfg = Config(dataset=dataset, hidden_dim=hidden_dim, time=time,
                 method="dopri5", tol_scale=100.0, lr=lr,
                 input_dropout=0.5, dropout=0.0)
    data = get_dataset(cfg, data_dir=data_dir)
    model = make_cgnn(cfg, data.num_features, data.num_classes)
    params = model.init_for_graph(jax.random.PRNGKey(seed), data.graph)
    g = normalize_for_cgnn(data.graph)
    tx = optax.adam(cfg.lr, b1=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits, _ = model.apply(p, g, data.x, train=True, rng=rng)
            logp = jax.nn.log_softmax(logits)
            per = -jnp.take_along_axis(logp, data.y[:, None], axis=1)[:, 0]
            return jnp.sum(jnp.where(data.train_mask, per, 0.0)) / \
                jnp.maximum(jnp.sum(data.train_mask), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits, _ = model.apply(params, g, data.x, train=False)
        return tuple(masked_accuracy(logits, data.y, m) for m in
                     (data.train_mask, data.val_mask, data.test_mask))

    rng = jax.random.PRNGKey(seed + 1)
    best = {"val_acc": 0.0, "test_acc": 0.0}
    for epoch in range(1, epochs + 1):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        tr, va, te = (float(a) for a in evaluate(params))
        if va > best["val_acc"]:
            best.update(val_acc=va, test_acc=te, epoch=epoch)
        if log_every and epoch % log_every == 0:
            print(f"[CGNN] epoch {epoch} loss {float(loss):.4f} "
                  f"val {va:.4f} test {te:.4f}")
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--epoch", type=int, default=50)
    p.add_argument("--hidden_dim", type=int, default=16)
    p.add_argument("--time", type=float, default=1.0)
    args = p.parse_args(argv)
    best = train_cgnn(args.dataset, epochs=args.epoch,
                      hidden_dim=args.hidden_dim, time=args.time)
    print(json.dumps(best))


if __name__ == "__main__":
    main()
