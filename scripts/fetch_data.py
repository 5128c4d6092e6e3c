#!/usr/bin/env python
"""Dataset fetch manifest + downloader for graphax.

The reference downloads everything lazily through PyG/OGB on first use
(`src/graph_datasets/data.py:34-110`). This environment has no egress, so
graphax loaders instead read the same raw files *if present* under a data
dir. This script is the one-command bridge: on a machine WITH egress,

    python scripts/fetch_data.py --data-dir ./data [--only cora ...]

downloads every raw file into exactly the layout `graphax.data.get_dataset`
expects, verifies sha256 where recorded, and then the seven preset parity
runs (`python -m graphax.drivers.run_gnn --dataset Cora ...`) execute
unchanged. With no egress it prints the manifest (URL -> destination) so
files can be staged by hand.

sha256 values are recorded after the first verified download (written to
<data-dir>/SHA256SUMS); entries listed as None are verified-on-first-fetch.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import zipfile

GH = "https://raw.githubusercontent.com"

PLANETOID_EXTS = ("x", "tx", "allx", "y", "ty", "ally", "graph", "test.index")
GEOM_GCN = f"{GH}/graphdml-uiuc-jlu/geom-gcn/master"

# name -> list of (url, relative destination under data_dir)
MANIFEST = {}

for _name in ("cora", "citeseer", "pubmed"):
    _cap = {"cora": "Cora", "citeseer": "Citeseer", "pubmed": "Pubmed"}[_name]
    MANIFEST[_name] = [
        (f"{GH}/kimiyoung/planetoid/master/data/ind.{_name}.{ext}",
         f"{_cap}/raw/ind.{_name}.{ext}")
        for ext in PLANETOID_EXTS
    ]

_SHCHUR = f"{GH}/shchur/gnn-benchmark/master/data/npz"
MANIFEST["computers"] = [(f"{_SHCHUR}/amazon_electronics_computers.npz",
                          "Computers/raw/amazon_electronics_computers.npz")]
MANIFEST["photo"] = [(f"{_SHCHUR}/amazon_electronics_photo.npz",
                      "Photo/raw/amazon_electronics_photo.npz")]
MANIFEST["coauthorcs"] = [(f"{_SHCHUR}/ms_academic_cs.npz",
                           "CoauthorCS/raw/ms_academic_cs.npz")]

# OGB ships arxiv as one zip whose inner layout already matches what
# load_ogbn_arxiv expects once extracted as <data_dir>/ogbn_arxiv/.
# __unzip__ destinations: "__unzip__:<out_dir>:<zip_inner_root>[:<marker>]"
# — <marker> is the relative file whose presence means already-extracted.
MANIFEST["ogbn-arxiv"] = [
    ("http://snap.stanford.edu/ogb/data/nodeproppred/arxiv.zip",
     "__unzip__:ogbn_arxiv:arxiv:raw/edge.csv.gz"),
]

# CLEVR_v1.0 (~18 GB): extracts to <data_dir>/CLEVR_v1.0/{images,questions};
# graphax.data.clevr.build_clevr_hdf5 then streams it into the chunked HDF5
# precompute (the reference's CLEVR_v1 build, `src/data_multi.py:326-428`).
# Stage the resnet101 / bert checkpoints too for real features.
MANIFEST["clevr"] = [
    ("https://dl.fbaipublicfiles.com/clevr/CLEVR_v1.0.zip",
     "__unzip__:.:.:CLEVR_v1.0/questions/CLEVR_train_questions.json"),
]

for _name in ("cornell", "texas", "wisconsin", "chameleon", "squirrel",
              "film"):
    files = [
        (f"{GEOM_GCN}/new_data/{_name}/out1_node_feature_label.txt",
         f"{_name}/raw/out1_node_feature_label.txt"),
        (f"{GEOM_GCN}/new_data/{_name}/out1_graph_edges.txt",
         f"{_name}/raw/out1_graph_edges.txt"),
    ]
    files += [
        (f"{GEOM_GCN}/splits/{_name}_split_0.6_0.2_{i}.npz",
         f"{_name}/raw/{_name}_split_0.6_0.2_{i}.npz")
        for i in range(10)
    ]
    MANIFEST[_name] = files

MANIFEST["mnist"] = [
    (f"https://ossci-datasets.s3.amazonaws.com/mnist/{f}",
     f"MNIST/raw/{f}")
    for f in ("train-images-idx3-ubyte.gz", "train-labels-idx1-ubyte.gz",
              "t10k-images-idx3-ubyte.gz", "t10k-labels-idx1-ubyte.gz")
]

# CLEVR feature-extractor weights (graphax.data.extractors). Discovery
# rules (find_resnet_checkpoint / find_text_checkpoint):
# - ResNet-101: any file matching <data-dir>/checkpoints/resnet101*.pth
#   (torchvision state dict; the reference uses
#   torchvision.models.resnet101 pretrained, `src/data_multi.py:209`).
# - BERT: a HuggingFace checkpoint DIRECTORY at
#   <data-dir>/checkpoints/bert (config.json + weights), e.g.
#   `BertModel.from_pretrained('bert-base-uncased').save_pretrained(...)`
#   (the reference tokenizes/embeds with BERT, `src/data_multi.py:252`).
# The extractor code paths themselves are format-verified without egress
# by tests/test_extractors_real.py (random weights in the same formats).
MANIFEST["resnet101"] = [
    ("https://download.pytorch.org/models/resnet101-63fe2227.pth",
     "checkpoints/resnet101-63fe2227.pth"),
]


def _sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _load_sums(data_dir):
    path = os.path.join(data_dir, "SHA256SUMS")
    sums = {}
    if os.path.exists(path):
        for line in open(path):
            parts = line.split()
            if len(parts) == 2:
                sums[parts[1]] = parts[0]
    return sums


def _save_sums(data_dir, sums):
    path = os.path.join(data_dir, "SHA256SUMS")
    with open(path, "w") as f:
        for dest in sorted(sums):
            f.write(f"{sums[dest]}  {dest}\n")


def fetch(url: str, timeout: float = 120.0) -> bytes:
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "graphax/0.1"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def fetch_to_file(url: str, path: str, timeout: float = 600.0) -> None:
    """Stream a (possibly huge — CLEVR_v1.0.zip is ~18 GB) download to
    disk; never holds the body in memory."""
    import shutil
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "graphax/0.1"})
    with urllib.request.urlopen(req, timeout=timeout) as r, \
            open(path, "wb") as f:
        shutil.copyfileobj(r, f, length=16 << 20)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--only", nargs="*", default=None,
                    help="dataset keys to fetch (default: all); "
                         f"choices: {sorted(MANIFEST)}")
    ap.add_argument("--list", action="store_true",
                    help="print the manifest and exit (no network)")
    args = ap.parse_args(argv)

    names = [n.lower() for n in (args.only or sorted(MANIFEST))]
    unknown = [n for n in names if n not in MANIFEST]
    if unknown:
        ap.error(f"unknown dataset keys {unknown}; choices {sorted(MANIFEST)}")

    if args.list:
        for name in names:
            for url, dest in MANIFEST[name]:
                if dest.startswith("__unzip__:"):
                    parts = dest.split(":")
                    where = os.path.normpath(
                        os.path.join(args.data_dir, parts[1]))
                    print(f"{url}\t[unzip into {where}/]")
                else:
                    print(f"{url}\t{args.data_dir}/{dest}")
        return 0

    sums = _load_sums(args.data_dir)
    failures = []
    for name in names:
        for url, dest in MANIFEST[name]:
            unzip = dest.startswith("__unzip__:")
            if unzip:
                parts = dest.split(":")
                out_name, inner_root = parts[1], parts[2]
                marker_rel = parts[3] if len(parts) > 3 else "raw/edge.csv.gz"
                target = os.path.join(args.data_dir, out_name)
                marker = os.path.join(target, marker_rel)
                if os.path.exists(marker):
                    print(f"[skip] {out_name} already extracted")
                    continue
            else:
                target = os.path.join(args.data_dir, dest)
                if os.path.exists(target):
                    if dest in sums:
                        got = _sha256(open(target, "rb").read())
                        if got != sums[dest]:
                            print(f"[STALE] {dest}: sha256 {got[:12]}... != "
                                  f"recorded {sums[dest][:12]}...; refetching")
                        else:
                            print(f"[ok] {dest}")
                            continue
                    else:
                        print(f"[skip] {dest} present (no recorded sha256)")
                        continue
            try:
                print(f"[get] {url}")
                if unzip:
                    # stream archives to disk — CLEVR_v1.0.zip is ~18 GB,
                    # far beyond an in-memory BytesIO
                    os.makedirs(args.data_dir, exist_ok=True)
                    zip_tmp = os.path.join(
                        args.data_dir, os.path.basename(url) + ".part")
                    fetch_to_file(url, zip_tmp)
                else:
                    data = fetch(url)
            except Exception as e:  # noqa: BLE001 — report and continue
                failures.append((url, str(e)))
                print(f"[FAIL] {url}: {e}", file=sys.stderr)
                continue
            if unzip:
                with zipfile.ZipFile(zip_tmp) as z:
                    for member in z.namelist():
                        rel = os.path.relpath(member, inner_root)
                        if rel.startswith(".."):
                            continue
                        out = os.path.join(target, rel)
                        if member.endswith("/"):
                            continue
                        os.makedirs(os.path.dirname(out), exist_ok=True)
                        with open(out, "wb") as f, z.open(member) as src:
                            import shutil

                            shutil.copyfileobj(src, f, length=16 << 20)
                os.remove(zip_tmp)
                print(f"[ok] extracted -> {target}")
            else:
                os.makedirs(os.path.dirname(target), exist_ok=True)
                with open(target, "wb") as f:
                    f.write(data)
                sums[dest] = _sha256(data)
                print(f"[ok] {dest} sha256={sums[dest][:12]}...")
    os.makedirs(args.data_dir, exist_ok=True)
    _save_sums(args.data_dir, sums)
    if failures:
        print(f"\n{len(failures)} file(s) failed — no egress? "
              "Run with --list to stage by hand.", file=sys.stderr)
        return 1
    print("\nAll requested datasets staged. Parity runs are now live, e.g.\n"
          "  python -m graphax.drivers.run_gnn --dataset Cora "
          "--use_best_params")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
