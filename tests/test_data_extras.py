"""Heterophilic parsers (real-format round trip via synthetic raw files),
DIGL datasets, CGNN driver, deepwalk best-pickle picker."""

import os
import pickle
import tempfile

import numpy as np

from graphax.data import get_dataset, make_sbm_dataset
from graphax.data.digl import digl_split, heat_dataset, ppr_dataset
from graphax.data.heterophilic import get_fixed_splits, load_heterophilic


def _write_geom_gcn_raw(tmp, name, n=30, dim=8, classes=3, edges=60,
                        actor=False, seed=0):
    rng = np.random.RandomState(seed)
    d = os.path.join(tmp, name, "raw")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "out1_node_feature_label.txt"), "w") as f:
        f.write("node_id\tfeature\tlabel\n")
        for i in range(n):
            if actor:
                idx = sorted(rng.choice(dim, 3, replace=False))
                feat = ",".join(str(v) for v in idx)
            else:
                feat = ",".join(f"{v:.3f}" for v in rng.rand(dim))
            f.write(f"{i}\t{feat}\t{rng.randint(classes)}\n")
    with open(os.path.join(d, "out1_graph_edges.txt"), "w") as f:
        f.write("src\tdst\n")
        for _ in range(edges):
            f.write(f"{rng.randint(n)}\t{rng.randint(n)}\n")
    return d


def test_heterophilic_parser_dense_features():
    with tempfile.TemporaryDirectory() as td:
        _write_geom_gcn_raw(td, "cornell", n=25, dim=6, classes=4)
        row, col, x, y, nc = load_heterophilic("cornell", td)
        assert x.shape == (25, 6)
        assert nc == int(y.max()) + 1
        assert row.max() < 25 and col.max() < 25


def test_heterophilic_parser_actor_sparse():
    with tempfile.TemporaryDirectory() as td:
        _write_geom_gcn_raw(td, "film", n=20, dim=10, actor=True)
        row, col, x, y, nc = load_heterophilic("Actor", td)
        assert set(np.unique(x)) <= {0.0, 1.0}
        assert (x.sum(axis=1) == 3).all()  # 3 indices per node


def test_heterophilic_fixed_splits():
    with tempfile.TemporaryDirectory() as td:
        d = _write_geom_gcn_raw(td, "texas", n=20, dim=4)
        n = 20
        tr = np.zeros(n, bool); tr[:12] = True
        va = np.zeros(n, bool); va[12:16] = True
        te = np.zeros(n, bool); te[16:] = True
        np.savez(os.path.join(d, "texas_split_0.6_0.2_0.npz"),
                 train_mask=tr, val_mask=va, test_mask=te)
        masks = get_fixed_splits("texas", td, 0, n)
        assert masks is not None
        np.testing.assert_array_equal(masks[0], tr)


def test_heterophilic_through_get_dataset():
    with tempfile.TemporaryDirectory() as td:
        _write_geom_gcn_raw(td, "wisconsin", n=40, dim=5, classes=3,
                            edges=150)
        data = get_dataset("wisconsin", data_dir=td,
                           synthetic_fallback=False)
        assert data.num_classes >= 2
        assert data.x.shape[1] == 5


def test_digl_datasets():
    d = make_sbm_dataset(num_nodes=40, seed=0)
    d_ppr = ppr_dataset(d, alpha=0.1, k=6)
    dense = np.asarray(d_ppr.graph.to_dense())
    assert ((dense > 0).sum(axis=0) <= 6).all()
    d_heat = heat_dataset(d, t=1.0, k=6)
    assert int(d_heat.graph.num_edges) > 0
    d_split = digl_split(d, seed=3)
    assert bool(d_split.train_mask.sum() > 0)


def test_cgnn_driver_smoke():
    from graphax.drivers.run_cgnn import train_cgnn

    with tempfile.TemporaryDirectory() as td:
        best = train_cgnn("Cora", epochs=2, data_dir=td, hidden_dim=8,
                          time=0.5, log_every=0)
    assert 0.0 <= best["val_acc"] <= 1.0


def test_pick_best_deepwalk_pickle():
    from graphax.rewiring.deepwalk import pick_best_embeddings

    with tempfile.TemporaryDirectory() as td:
        pos = os.path.join(td, "pos_encodings")
        os.makedirs(pos)
        for tag, acc in (("a", 0.3), ("b", 0.9)):
            with open(os.path.join(pos, f"Cora_DW16_{tag}.pkl"), "wb") as f:
                pickle.dump({"data": np.ones((4, 16)) * acc, "acc": acc}, f)
        path = pick_best_embeddings(td, "Cora", 16)
        assert path is not None and os.path.exists(path)
        with open(path, "rb") as f:
            obj = pickle.load(f)
        assert obj["acc"] == 0.9


def test_synthetic_fallback_homophily_class_count_invariant():
    """The SBM stand-ins must stay homophilic (~75% same-class neighbors)
    regardless of class count, or diffusion can't help on the many-class
    datasets (CoauthorCS: 15, ogbn-arxiv: 40) and the tuned-config smoke
    runs plateau near chance."""
    import jax.numpy as jnp

    with tempfile.TemporaryDirectory() as td:
        for name in ("Citeseer", "CoauthorCS"):
            data = get_dataset(name, data_dir=td, synthetic_fallback=True)
            g = data.graph
            row = np.asarray(g.row)[np.asarray(g.edge_mask)]
            col = np.asarray(g.col)[np.asarray(g.edge_mask)]
            off_diag = row != col  # exclude self loops
            y = np.asarray(data.y)
            same = (y[row[off_diag]] == y[col[off_diag]]).mean()
            assert 0.6 < same < 0.9, (name, same)
