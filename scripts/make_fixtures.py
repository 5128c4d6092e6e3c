"""Generate tiny committed fixtures in the REAL on-disk dataset formats.

The zero-egress environment cannot download Planetoid/Amazon/OGB files, so
the raw-format parsers in `graphax.data.loaders` would otherwise first run
against real files in production. These fixtures are hand-built in the
exact formats the parsers consume (ref formats:
`/root/reference/src/graph_datasets/data.py:34-110`):

- Planetoid `ind.<name>.{x,tx,allx,y,ty,ally,graph,test.index}` pickles
  (Kipf layout; the Citeseer variant has a GAP in the test indices to
  exercise the isolated-test-node extension path),
- Amazon/Coauthor `*.npz` (shchur/gnn-benchmark CSR layout),
- ogbn-arxiv `raw/{edge,node-feat,node-label}.csv.gz` +
  `split/time/{train,valid,test}.csv.gz`.

Deterministic: re-running reproduces byte-identical content (fixed seeds,
fixed pickle protocol). Ground truth (the dense arrays the parsers must
recover) is written alongside as `expected.npz` for the tests.
"""

import gzip
import os
import pickle
import sys

import numpy as np
import scipy.sparse as sp

BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "datasets")


def _write_pickle(path, obj):
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=2)


def make_planetoid(name: str, with_gap: bool):
    """12 nodes: 8 in allx (0-7), 4 test (8-11). ``with_gap`` drops node 10
    from tx/test.index (isolated test node — the Citeseer quirk)."""
    rng = np.random.RandomState(7 if with_gap else 3)
    n, f, c = 12, 5, 3
    x_all = (rng.rand(n, f) < 0.4).astype(np.float64)
    y_all = rng.randint(0, c, n)
    onehot = np.eye(c)[y_all]

    raw_dir = os.path.join(BASE, name, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    lname = name.lower()

    allx = sp.csr_matrix(x_all[:8])
    ally = onehot[:8]
    if with_gap:
        test_order = np.array([9, 8, 11])       # node 10 is isolated
        y_all[10] = 0                            # parser recovers argmax 0
        onehot[10] = 0
        x_all[10] = 0.0                          # not in tx -> parsed as 0s
    else:
        test_order = np.array([10, 8, 11, 9])    # file order != sorted
    # tx/ty rows are stored in test.index FILE order — the loader's
    # `x[test_idx] = x[test_sorted]` permutation is what puts them right
    tx = sp.csr_matrix(x_all[test_order])
    ty = onehot[test_order]
    # labeled-train block (unused by the parser but part of the format)
    xs = sp.csr_matrix(x_all[:3])
    ys = onehot[:3]

    # ring + a few chords, as adjacency dict
    graph = {i: [(i + 1) % n, (i - 1) % n] for i in range(n)}
    graph[0].append(6)
    graph[6].append(0)
    graph[3].append(9)
    graph[9].append(3)

    _write_pickle(os.path.join(raw_dir, f"ind.{lname}.x"), xs)
    _write_pickle(os.path.join(raw_dir, f"ind.{lname}.tx"), tx)
    _write_pickle(os.path.join(raw_dir, f"ind.{lname}.allx"), allx)
    _write_pickle(os.path.join(raw_dir, f"ind.{lname}.y"), ys)
    _write_pickle(os.path.join(raw_dir, f"ind.{lname}.ty"), ty)
    _write_pickle(os.path.join(raw_dir, f"ind.{lname}.ally"), ally)
    _write_pickle(os.path.join(raw_dir, f"ind.{lname}.graph"), graph)
    with open(os.path.join(raw_dir, f"ind.{lname}.test.index"), "w") as fh:
        fh.write("\n".join(str(i) for i in test_order) + "\n")

    # ground truth the parser must reconstruct
    rows = np.array(sorted((s, d) for s, nb in graph.items() for d in nb))
    np.savez(os.path.join(BASE, name, "expected.npz"),
             x=x_all.astype(np.float32), y=y_all.astype(np.int64),
             edges=rows, num_classes=c)


def make_npz(name: str, fname: str):
    rng = np.random.RandomState(11)
    n, f, c = 15, 6, 4
    x = (rng.rand(n, f) < 0.3).astype(np.float32) * rng.rand(n, f)
    y = rng.randint(0, c, n)
    src = rng.randint(0, n, 40)
    dst = rng.randint(0, n, 40)
    keep = src != dst
    adj = sp.csr_matrix((np.ones(keep.sum(), np.float32),
                         (src[keep], dst[keep])), shape=(n, n))
    adj.sum_duplicates()
    attr = sp.csr_matrix(x)
    out_dir = os.path.join(BASE, name)
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, fname),
             adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=np.array(adj.shape),
             attr_data=attr.data, attr_indices=attr.indices,
             attr_indptr=attr.indptr, attr_shape=np.array(attr.shape),
             labels=y.astype(np.int64))
    coo = adj.tocoo()
    np.savez(os.path.join(out_dir, "expected.npz"), x=x,
             y=y.astype(np.int64),
             edges=np.stack([coo.row, coo.col], 1), num_classes=c)


def make_ogbn_arxiv():
    rng = np.random.RandomState(5)
    n, f, c = 20, 4, 40
    x = np.round(rng.randn(n, f).astype(np.float32), 4)
    y = rng.randint(0, c, n)
    src = rng.randint(0, n, 50)
    dst = rng.randint(0, n, 50)
    keep = src != dst
    edges = np.stack([src[keep], dst[keep]], 1)
    perm = rng.permutation(n)
    tr, va, te = perm[:10], perm[10:14], perm[14:]

    raw_dir = os.path.join(BASE, "ogbn_arxiv", "raw")
    split_dir = os.path.join(BASE, "ogbn_arxiv", "split", "time")
    os.makedirs(raw_dir, exist_ok=True)
    os.makedirs(split_dir, exist_ok=True)

    def write_csv_gz(path, arr, fmt):
        # mtime=0 so the gzip bytes are deterministic across runs
        with gzip.GzipFile(path, "wb", mtime=0) as fh:
            lines = "\n".join(",".join(fmt % v for v in np.atleast_1d(r))
                              for r in arr) + "\n"
            fh.write(lines.encode())

    write_csv_gz(os.path.join(raw_dir, "edge.csv.gz"), edges, "%d")
    write_csv_gz(os.path.join(raw_dir, "node-feat.csv.gz"), x, "%.4f")
    write_csv_gz(os.path.join(raw_dir, "node-label.csv.gz"),
                 y.reshape(-1, 1), "%d")
    write_csv_gz(os.path.join(split_dir, "train.csv.gz"),
                 tr.reshape(-1, 1), "%d")
    write_csv_gz(os.path.join(split_dir, "valid.csv.gz"),
                 va.reshape(-1, 1), "%d")
    write_csv_gz(os.path.join(split_dir, "test.csv.gz"),
                 te.reshape(-1, 1), "%d")
    np.savez(os.path.join(BASE, "ogbn_arxiv", "expected.npz"),
             x=x, y=y.astype(np.int64), edges=edges, train_idx=np.sort(tr),
             valid_idx=np.sort(va), test_idx=np.sort(te), num_classes=c)


if __name__ == "__main__":
    make_planetoid("Cora", with_gap=False)
    make_planetoid("Citeseer", with_gap=True)
    make_npz("Computers", "amazon_electronics_computers.npz")
    make_npz("CoauthorCS", "ms_academic_cs.npz")
    make_ogbn_arxiv()
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(BASE) for f in fs)
    print(f"fixtures written under {BASE} ({total/1024:.1f} KiB)",
          file=sys.stderr)
