"""DeepWalk node embeddings (positional encodings DW64/DW128/DW256).

Capability twin of `src/graph_datasets/deepwalk_embeddings.py`, which trains
PyG `Node2Vec` with p=q=1 (⇒ DeepWalk) and evaluates with logistic
regression, pickling ``{'data', 'acc'}``. Here: host-side uniform random
walks + a jitted skip-gram with negative sampling trained by optax, and a
ridge-classifier probe for the accuracy metric."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def random_walks(row, col, num_nodes: int, walk_length: int = 20,
                 walks_per_node: int = 10, seed: int = 0) -> np.ndarray:
    """Uniform random walks [num_nodes·walks_per_node, walk_length]."""
    rng = np.random.RandomState(seed)
    # CSR
    order = np.argsort(row, kind="stable")
    row_s, col_s = np.asarray(row)[order], np.asarray(col)[order]
    ptr = np.searchsorted(row_s, np.arange(num_nodes + 1))
    deg = np.diff(ptr)

    starts = np.tile(np.arange(num_nodes), walks_per_node)
    walks = np.empty((len(starts), walk_length), np.int64)
    walks[:, 0] = starts
    cur = starts.copy()
    for t in range(1, walk_length):
        r = rng.rand(len(cur))
        has_nbrs = deg[cur] > 0
        offset = (r * np.maximum(deg[cur], 1)).astype(np.int64)
        nxt = col_s[ptr[cur] + np.minimum(offset, np.maximum(deg[cur] - 1, 0))]
        cur = np.where(has_nbrs, nxt, cur)
        walks[:, t] = cur
    return walks


def skipgram_train(walks: np.ndarray, num_nodes: int, dim: int,
                   window: int = 5, negatives: int = 5, epochs: int = 3,
                   lr: float = 0.025, batch: int = 8192, seed: int = 0
                   ) -> np.ndarray:
    """Skip-gram with negative sampling over walk context pairs (jitted)."""
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.RandomState(seed)
    # build (center, context) pairs
    pairs = []
    l = walks.shape[1]
    for off in range(1, window + 1):
        pairs.append(np.stack([walks[:, :l - off].reshape(-1),
                               walks[:, off:].reshape(-1)], axis=1))
    pairs = np.concatenate(pairs, axis=0)
    rng.shuffle(pairs)

    key = jax.random.PRNGKey(seed)
    emb = 0.1 * jax.random.normal(key, (num_nodes, dim))
    ctx = jnp.zeros((num_nodes, dim))
    params = {"emb": emb, "ctx": ctx}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, centers, contexts, negs):
        def loss_fn(p):
            ce = p["emb"][centers]                       # [B, D]
            pos = jnp.sum(ce * p["ctx"][contexts], axis=-1)
            neg = jnp.einsum("bd,bkd->bk", ce, p["ctx"][negs])
            return -(jnp.mean(jax.nn.log_sigmoid(pos))
                     + jnp.mean(jax.nn.log_sigmoid(-neg)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n_pairs = len(pairs)
    for _ in range(epochs):
        for s in range(0, n_pairs - batch + 1, batch):
            chunk = pairs[s:s + batch]
            negs = rng.randint(0, num_nodes, size=(batch, negatives))
            params, opt_state, _ = step(params, opt_state,
                                        jnp.asarray(chunk[:, 0]),
                                        jnp.asarray(chunk[:, 1]),
                                        jnp.asarray(negs))
    return np.asarray(params["emb"], dtype=np.float32)


def _probe_accuracy(emb, labels, seed=0) -> float:
    """Ridge-classifier probe (stand-in for the reference's logistic
    regression eval) on a random 70/30 split."""
    rng = np.random.RandomState(seed)
    n = emb.shape[0]
    idx = rng.permutation(n)
    split = int(0.7 * n)
    tr, te = idx[:split], idx[split:]
    y_oh = np.eye(int(labels.max()) + 1)[labels]
    x_tr = np.concatenate([emb[tr], np.ones((len(tr), 1))], axis=1)
    x_te = np.concatenate([emb[te], np.ones((len(te), 1))], axis=1)
    w, *_ = np.linalg.lstsq(x_tr.T @ x_tr + 1e-3 * np.eye(x_tr.shape[1]),
                            x_tr.T @ y_oh[tr], rcond=None)
    pred = (x_te @ w).argmax(axis=1)
    return float((pred == labels[te]).mean())


def deepwalk_embeddings(row, col, num_nodes: int, dim: int = 64,
                        labels: Optional[np.ndarray] = None,
                        walk_length: int = 20, walks_per_node: int = 10,
                        epochs: int = 2, seed: int = 0
                        ) -> Tuple[np.ndarray, float]:
    """Returns (embeddings [N, dim], probe accuracy) — the reference pickles
    exactly this pair."""
    walks = random_walks(row, col, num_nodes, walk_length, walks_per_node,
                         seed)
    emb = skipgram_train(walks, num_nodes, dim, epochs=epochs, seed=seed)
    acc = _probe_accuracy(emb, np.asarray(labels), seed) \
        if labels is not None else float("nan")
    return emb, acc


def pick_best_embeddings(cache_dir: str, dataset: str, dim: int):
    """Pick the best-accuracy DW pickle among candidates and link it to the
    canonical `{dataset}_DW{dim}.pkl` name — the capability of
    `deepwalk_gen_symlinks.py` (`:24-47`)."""
    import os
    import pickle

    pos_dir = os.path.join(cache_dir, "pos_encodings")
    if not os.path.isdir(pos_dir):
        return None
    best, best_acc = None, -1.0
    for fname in os.listdir(pos_dir):
        if fname.startswith(f"{dataset}_DW{dim}") and fname.endswith(".pkl"):
            with open(os.path.join(pos_dir, fname), "rb") as f:
                obj = pickle.load(f)
            acc = obj.get("acc", 0.0) if isinstance(obj, dict) else 0.0
            if acc > best_acc:
                best, best_acc = fname, acc
    if best is None:
        return None
    canonical = os.path.join(pos_dir, f"{dataset}_DW{dim}.pkl")
    src = os.path.join(pos_dir, best)
    if os.path.abspath(src) != os.path.abspath(canonical):
        if os.path.lexists(canonical):
            os.remove(canonical)
        os.symlink(os.path.basename(src), canonical)
    return canonical
