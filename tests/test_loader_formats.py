"""Format-verify the raw-dataset parsers against committed fixtures.

The fixtures under tests/fixtures/datasets are tiny files in the EXACT
on-disk formats the reference's datasets ship in (Planetoid `ind.*`
pickles incl. the Citeseer isolated-test-node gap, shchur npz CSR, OGB
csv.gz + time splits) — so the first real-data run is not the first parser
run (VERDICT r2 item 4; ref `/root/reference/src/graph_datasets/data.py`).
Ground truth lives beside each fixture as expected.npz, written by
scripts/make_fixtures.py (deterministic; re-run it if formats evolve).
"""

import os
import shutil

import numpy as np
import pytest

from graphax.data.loaders import (
    get_dataset, load_npz_dataset, load_ogbn_arxiv, load_planetoid,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "datasets")


def _expected(name):
    with np.load(os.path.join(FIXTURES, name, "expected.npz")) as f:
        return {k: f[k] for k in f.files}


def _edge_set(row, col):
    return set(zip(row.tolist(), col.tolist()))


@pytest.mark.parametrize("name", ["Cora", "Citeseer"])
def test_planetoid_pickle_format(name):
    row, col, x, y, nc = load_planetoid(name, FIXTURES)
    exp = _expected(name)
    assert nc == int(exp["num_classes"])
    np.testing.assert_array_equal(y, exp["y"])
    # the test-row permutation must place every node's features correctly,
    # including the isolated Citeseer node (all-zero row)
    np.testing.assert_allclose(x, exp["x"], atol=1e-6)
    assert _edge_set(row, col) == _edge_set(exp["edges"][:, 0],
                                            exp["edges"][:, 1])


@pytest.mark.parametrize("name,fname", [
    ("Computers", "amazon_electronics_computers.npz"),
    ("CoauthorCS", "ms_academic_cs.npz"),
])
def test_npz_csr_format(name, fname):
    row, col, x, y, nc = load_npz_dataset(name, FIXTURES)
    exp = _expected(name)
    assert nc == int(exp["num_classes"])
    np.testing.assert_array_equal(y, exp["y"])
    np.testing.assert_allclose(x, exp["x"], atol=1e-6)
    assert _edge_set(row, col) == _edge_set(exp["edges"][:, 0],
                                            exp["edges"][:, 1])


def test_ogbn_arxiv_csv_gz_and_cache(tmp_path):
    # copy the fixture tree so the parser's npz cache write is exercised
    # without polluting the committed fixtures
    shutil.copytree(os.path.join(FIXTURES, "ogbn_arxiv"),
                    tmp_path / "ogbn_arxiv")
    exp = _expected("ogbn_arxiv")

    def check(res):
        row, col, x, y, nc, (m_tr, m_va, m_te) = res
        assert nc == 40
        np.testing.assert_allclose(x, exp["x"], atol=1e-4)
        np.testing.assert_array_equal(y, exp["y"])
        assert _edge_set(row, col) == _edge_set(exp["edges"][:, 0],
                                                exp["edges"][:, 1])
        np.testing.assert_array_equal(np.flatnonzero(m_tr), exp["train_idx"])
        np.testing.assert_array_equal(np.flatnonzero(m_va), exp["valid_idx"])
        np.testing.assert_array_equal(np.flatnonzero(m_te), exp["test_idx"])

    check(load_ogbn_arxiv(str(tmp_path)))           # parses csv.gz
    cache = tmp_path / "ogbn_arxiv" / "processed_graphax.npz"
    assert cache.exists(), "first parse should write the npz cache"
    check(load_ogbn_arxiv(str(tmp_path)))           # reloads the cache


def test_get_dataset_end_to_end_from_fixture_files():
    """The full pipeline (parse → LCC → build_graph → split) on real-format
    files, with the synthetic fallback OFF — proves the parser path, not
    the SBM stand-in, produced the GraphData."""
    data = get_dataset("Cora", data_dir=FIXTURES, synthetic_fallback=False)
    exp = _expected("Cora")
    n = exp["x"].shape[0]
    assert data.x.shape[0] <= n and data.x.shape[1] == exp["x"].shape[1]
    assert data.num_classes == int(exp["num_classes"])
    assert int(data.train_mask.sum()) > 0
    assert int(data.test_mask.sum()) > 0
    # masks are disjoint
    tr = np.asarray(data.train_mask)
    va = np.asarray(data.val_mask)
    te = np.asarray(data.test_mask)
    assert not np.any(tr & va) and not np.any(tr & te) and not np.any(va & te)


def test_fixture_generator_is_deterministic(tmp_path):
    """Re-running scripts/make_fixtures.py must reproduce the committed
    bytes — guards fixture/expected.npz drift."""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "make_fixtures.py")
    # run against a scratch copy by patching BASE via env-free approach:
    # copy the script and rewrite its BASE constant
    src = open(script).read()
    patched = src.replace(
        'BASE = os.path.join(os.path.dirname(os.path.dirname(\n'
        '    os.path.abspath(__file__))), "tests", "fixtures", "datasets")',
        f'BASE = {str(tmp_path / "datasets")!r}')
    assert patched != src, "BASE constant not found to patch"
    p = tmp_path / "make_fixtures.py"
    p.write_text(patched)
    subprocess.run([sys.executable, str(p)], check=True,
                   capture_output=True)
    for root, _, files in os.walk(FIXTURES):
        rel = os.path.relpath(root, FIXTURES)
        for f in files:
            a = os.path.join(root, f)
            b = os.path.join(tmp_path / "datasets", rel, f)
            assert os.path.exists(b), f"missing regenerated {rel}/{f}"
            assert open(a, "rb").read() == open(b, "rb").read(), \
                f"fixture drift: {rel}/{f}"
