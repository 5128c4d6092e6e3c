"""Heterophilic parsers (real-format round trip via synthetic raw files),
DIGL datasets, CGNN driver, deepwalk best-pickle picker."""

import os
import pickle
import tempfile

import numpy as np
import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ----------------------------------------------------------------------
# round 2: real-data readiness (VERDICT #9) + extractor checkpoints (#6)
# ----------------------------------------------------------------------

def _write_arxiv_fixture(base, n=12, e=30, d=5):
    """Tiny hand-built ogbn-arxiv raw layout (csv.gz, OGB format)."""
    import gzip
    rng = np.random.RandomState(0)
    raw = os.path.join(base, "ogbn_arxiv", "raw")
    split = os.path.join(base, "ogbn_arxiv", "split", "time")
    os.makedirs(raw), os.makedirs(split)

    def w(path, arr, fmt):
        with gzip.open(path, "wt") as f:
            for r in np.atleast_2d(arr):
                f.write(",".join(fmt % v for v in np.atleast_1d(r)) + "\n")

    edges = rng.randint(0, n, (e, 2))
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, 4, n)
    w(os.path.join(raw, "edge.csv.gz"), edges, "%d")
    w(os.path.join(raw, "node-feat.csv.gz"), x, "%.6f")
    w(os.path.join(raw, "node-label.csv.gz"), y[:, None], "%d")
    idx = rng.permutation(n)
    for part, sl in (("train", idx[:6]), ("valid", idx[6:9]),
                     ("test", idx[9:])):
        w(os.path.join(split, f"{part}.csv.gz"), sl[:, None], "%d")
    return edges, x, y


def test_ogbn_arxiv_loader_and_npz_cache():
    from graphax.data.loaders import load_ogbn_arxiv

    with tempfile.TemporaryDirectory() as td:
        edges, x, y = _write_arxiv_fixture(td)
        row, col, xx, yy, nc, masks = load_ogbn_arxiv(td)
        assert nc == 40
        np.testing.assert_array_equal(row, edges[:, 0])
        np.testing.assert_allclose(xx, x, atol=1e-5)
        np.testing.assert_array_equal(yy, y)
        assert masks[0].sum() == 6 and masks[1].sum() == 3
        # second load comes from the npz cache and must be identical
        cache = os.path.join(td, "ogbn_arxiv", "processed_graphax.npz")
        assert os.path.exists(cache)
        row2, col2, x2, y2, _, masks2 = load_ogbn_arxiv(td)
        np.testing.assert_array_equal(row2, row)
        np.testing.assert_array_equal(col2, col)
        np.testing.assert_allclose(x2, xx, atol=1e-6)
        for a, b in zip(masks, masks2):
            np.testing.assert_array_equal(a, b)


def test_fetch_data_manifest_layout():
    """--list output destinations must match what the loaders search for."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "fetch_data.py"),
         "--list", "--data-dir", "DD"],
        capture_output=True, text=True, check=True).stdout
    dests = [line.split("\t")[1] for line in out.strip().splitlines()]
    assert "DD/Cora/raw/ind.cora.x" in dests
    assert "DD/Computers/raw/amazon_electronics_computers.npz" in dests
    assert "DD/CoauthorCS/raw/ms_academic_cs.npz" in dests
    assert "DD/cornell/raw/out1_graph_edges.txt" in dests
    assert "DD/cornell/raw/cornell_split_0.6_0.2_0.npz" in dests
    # zip entries render as "[unzip into <dir>/]" in --list (r4)
    assert any("unzip into DD/ogbn_arxiv" in d for d in dests)
    assert any("unzip into DD" in d and "CLEVR" not in d for d in dests)
    assert "DD/MNIST/raw/train-images-idx3-ubyte.gz" in dests
    # CLEVR_v1.0.zip staged (graphax.data.clevr ingestion)
    urls = [line.split("\t")[0] for line in out.strip().splitlines()]
    assert any("CLEVR_v1.0.zip" in u for u in urls)


def _tiny_resnet_state_dict(stages=(1, 1), width=4):
    """Random torchvision-layout state dict for a 2-stage bottleneck net."""
    import torch
    torch.manual_seed(0)
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.randn(cout, cin, k, k) * 0.2

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c) + 0.5
        sd[name + ".bias"] = torch.randn(c) * 0.1
        sd[name + ".running_mean"] = torch.randn(c) * 0.1
        sd[name + ".running_var"] = torch.rand(c) + 0.5

    conv("conv1", width, 3, 7), bn("bn1", width)
    cin = width
    for s, blocks in enumerate(stages):
        planes, cout = width * 2 ** s, width * 4 * 2 ** s
        for i in range(blocks):
            p = f"layer{s + 1}.{i}"
            conv(p + ".conv1", planes, cin, 1), bn(p + ".bn1", planes)
            conv(p + ".conv2", planes, planes, 3), bn(p + ".bn2", planes)
            conv(p + ".conv3", cout, planes, 1), bn(p + ".bn3", cout)
            if i == 0:
                conv(p + ".downsample.0", cout, cin, 1)
                bn(p + ".downsample.1", cout)
            cin = cout
    return sd


def _torch_trunk_forward(x_nhwc, sd, stages):
    """Independent torch forward of the same trunk (NCHW)."""
    import torch
    import torch.nn.functional as F

    def conv(x, name, stride=1):
        w = sd[name + ".weight"]
        return F.conv2d(x, w, stride=stride, padding=w.shape[-1] // 2)

    def bn(x, name):
        return F.batch_norm(x, sd[name + ".running_mean"],
                            sd[name + ".running_var"], sd[name + ".weight"],
                            sd[name + ".bias"], training=False)

    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    out = F.relu(bn(conv(x, "conv1", 2), "bn1"))
    out = F.max_pool2d(out, 3, stride=2, padding=1)
    for s in range(len(stages)):
        for i in range(stages[s]):
            p, stride = f"layer{s + 1}.{i}", 2 if (s > 0 and i == 0) else 1
            h = F.relu(bn(conv(out, p + ".conv1"), p + ".bn1"))
            h = F.relu(bn(conv(h, p + ".conv2", stride), p + ".bn2"))
            h = bn(conv(h, p + ".conv3"), p + ".bn3")
            if (p + ".downsample.0.weight") in sd:
                sc = bn(conv(out, p + ".downsample.0", stride),
                        p + ".downsample.1")
            else:
                sc = out
            out = F.relu(h + sc)
    return out.permute(0, 2, 3, 1).numpy()


def test_resnet_trunk_matches_torch():
    """JAX trunk == independent torch forward on a random tiny state dict
    (pins the OIHW/NHWC conversion, torch padding, BN eps, maxpool)."""
    import torch

    from graphax.data.extractors import load_torch_state_dict, resnet_trunk

    stages = (1, 1)
    sd = _tiny_resnet_state_dict(stages)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    ref = _torch_trunk_forward(x, sd, stages)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "resnet101-tiny.pth")
        torch.save(sd, path)
        params = load_torch_state_dict(path)
    got = np.asarray(resnet_trunk(x, params, stages=stages,
                                  out_stage=len(stages)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_image_extractor_checkpoint_routing():
    """Extractor uses the staged resnet101 .pth and projects to feat_dim."""
    import torch

    from graphax.data.extractors import ImageFeatureExtractor

    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "checkpoints")
        os.makedirs(ck)
        torch.save(_tiny_resnet_state_dict((1, 1)), 
                   os.path.join(ck, "resnet101-tiny.pth"))
        ex = ImageFeatureExtractor(8, data_dir=td)
        assert ex.using_real_weights  # discovered the staged .pth
        # (full-depth forward parity is pinned in
        # test_resnet_trunk_matches_torch; here check discovery + fallback)
        ex2 = ImageFeatureExtractor(8, data_dir=None, seed=0)
        assert not ex2.using_real_weights
        out = ex2(np.random.RandomState(0).rand(3, 14, 14, 3)
                  .astype(np.float32))
        assert out.shape == (3, 196, 8)


def test_text_extractor_fallback_deterministic():
    from graphax.data.extractors import TextFeatureExtractor

    ex = TextFeatureExtractor(16, vocab_size=50, seed=3)
    ids = np.array([[1, 2, 3], [4, 5, 49]])
    a, b = ex(ids), TextFeatureExtractor(16, vocab_size=50, seed=3)(ids)
    assert a.shape == (2, 3, 16)
    np.testing.assert_allclose(a, b)
