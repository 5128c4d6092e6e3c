"""Synthetic graph datasets — hermetic stand-ins for the reference's
downloaded benchmarks (this environment has no network egress).

`make_sbm_dataset` plants a stochastic block model whose communities are the
labels and whose features are noisy class prototypes — a node-classification
task a diffusion GNN genuinely has to use the graph to solve well.
`make_synthetic_cora` matches Cora's shape statistics (N≈2485 LCC, ~5069
undirected edges, 1433 features, 7 classes) so jit cache shapes and perf
characteristics mirror the real dataset."""

from __future__ import annotations

import numpy as np

from graphax.data.container import GraphData
from graphax.data.splits import set_train_val_test_split
from graphax.sparse import build


def make_sbm_dataset(num_nodes: int = 400, num_classes: int = 4,
                     num_features: int = 32, p_in: float = 0.04,
                     p_out: float = 0.002, feature_noise: float = 1.0,
                     seed: int = 0, self_loop_weight: float = 1.0,
                     num_development: int = None, num_per_class: int = 20,
                     pad_multiple: int = 128) -> GraphData:
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    y = rng.randint(0, num_classes, num_nodes)

    # sample undirected SBM edges block-wise without materializing N² bools
    rows, cols = [], []
    for ci in range(num_classes):
        for cj in range(ci, num_classes):
            p = p_in if ci == cj else p_out
            ni = np.where(y == ci)[0]
            nj = np.where(y == cj)[0]
            m = rng.binomial(len(ni) * len(nj), p)
            if m == 0:
                continue
            r = ni[rng.randint(0, len(ni), m)]
            c = nj[rng.randint(0, len(nj), m)]
            keep = r != c
            rows.append(r[keep]); cols.append(c[keep])
    row = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    col = np.concatenate(cols) if cols else np.zeros(0, np.int64)

    prototypes = rng.randn(num_classes, num_features)
    x = prototypes[y] + feature_noise * rng.randn(num_nodes, num_features)
    # unit overall scale (real benchmark features are normalized); the
    # class-separability SNR — set by feature_noise — is unchanged
    x = x / np.sqrt(1.0 + feature_noise ** 2)

    graph = build.build_graph(row, col, num_nodes, make_undirected=True,
                              self_loop_weight=self_loop_weight,
                              pad_multiple=pad_multiple)
    if num_development is None:
        num_development = max(min(num_nodes // 2, 1500),
                              num_per_class * num_classes + 10)
    num_development = min(num_development, max(num_nodes - 10, 1))
    # the seeded dev pool may underrepresent a class; shrink num_per_class
    # until the reference split protocol is satisfiable
    npc = min(num_per_class, num_nodes)
    while npc > 1:
        try:
            tr, va, te = set_train_val_test_split(
                12345, y, num_development=num_development, num_per_class=npc)
            break
        except ValueError:
            npc //= 2
    else:
        tr, va, te = set_train_val_test_split(
            12345, y, num_development=num_development, num_per_class=1)
    return GraphData(graph=graph, x=jnp.asarray(x, jnp.float32),
                     y=jnp.asarray(y), train_mask=jnp.asarray(tr),
                     val_mask=jnp.asarray(va), test_mask=jnp.asarray(te),
                     num_classes=num_classes)


def make_synthetic_cora(seed: int = 0, self_loop_weight: float = 1.0
                        ) -> GraphData:
    """Cora-shaped SBM: 2485 nodes / ~10k directed edge slots / 1433 features
    / 7 classes, same split protocol as the reference (1500 dev, 20/class)."""
    return make_sbm_dataset(num_nodes=2485, num_classes=7, num_features=1433,
                            p_in=0.0032, p_out=0.00025, feature_noise=18.0,
                            seed=seed, self_loop_weight=self_loop_weight,
                            num_development=1500, num_per_class=20)
