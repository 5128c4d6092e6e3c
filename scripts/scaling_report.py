"""Multi-chip scaling report → SCALING.md.

Real multi-chip hardware is not available in this environment (one v5e chip
behind a tunnel), so this report combines the three things that ARE
measurable/derivable here:

1. **Exact halo-exchange volume** from the partition tables
   (`graphax.dist.partition.partition_graph`): per-NFE bytes each chip must
   move over ICI vs the bytes its local compute touches. This is a property
   of the partitioner + graph, independent of hardware.
2. **An analytic per-NFE time model** anchored to the measured single-chip
   RHS time (bench.py): T_comp(P) = T_1chip · (slots_shard / slots_total),
   T_halo(P) = halo_bytes / BW_ICI. Efficiency with the double-buffered
   overlap the halo design targets is T_comp / max(T_comp, T_halo); the
   serial bound is T_comp / (T_comp + T_halo).
3. **Numerical parity of the sharded path** on a virtual 8-device CPU mesh:
   sharded_spmm_halo == single-device SpMM to fp tolerance.

Graphs: the bench's uniform random graph (worst case for edge cuts — no
community structure) and a 40-block SBM at the same size (realistic
community structure, what METIS-style contiguous row blocks exploit).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ICI_BW = 90e9          # bytes/s per chip, aggregate one-way (v5e-order ICI)
T_SPMM_1CHIP = 11.7e-3  # measured bench.py spmm_rhs_ms at arxiv scale (host-fetch-synced timing)
DTYPE_BYTES = 2         # bf16 features


def build_graph(kind: str, n: int, avg_deg: int, seed: int = 1):
    """kinds: "uniform" | "sbm" (community structure, node ids SHUFFLED so
    partitioners must find it) | "sbm_ordered" (ids sorted by community —
    what a dataset looks like AFTER graphax.data.community_reorder, the
    precondition of the windowed strategy)."""
    rng = np.random.RandomState(seed)
    if kind == "uniform":
        row = rng.randint(0, n, n * avg_deg)
        col = rng.randint(0, n, n * avg_deg)
    else:  # sbm: 40 communities, 75% of edges within the community
        c = 40
        block = (n + c - 1) // c
        comm = rng.randint(0, c, n * avg_deg)
        row = (comm * block + rng.randint(0, block, n * avg_deg)) % n
        within = rng.rand(n * avg_deg) < 0.75
        col_in = (comm * block + rng.randint(0, block, n * avg_deg)) % n
        col_out = rng.randint(0, n, n * avg_deg)
        col = np.where(within, col_in, col_out)
        if kind != "sbm_ordered":
            # real datasets' node ids are NOT sorted by community — shuffle
            # so contiguous id blocks can't exploit the structure for free
            # and the partitioners have to find it
            perm = rng.permutation(n)
            row, col = perm[row], perm[col]
    keep = row != col
    row, col = row[keep], col[keep]
    order = np.lexsort((col, row))
    return row[order], col[order]


def analyze(kind: str, n: int, d: int, shards, avg_deg: int = 14,
            method: str = "contiguous", measured=None):
    from graphax import native

    row, col = build_graph(kind, n, avg_deg)
    e = len(row)
    rows = []
    for p in shards:
        nb = ((n + p - 1) // p + 7) // 8 * 8   # round_up(ceil(n/p), 8)
        if method == "bfs":
            labels, _ = native.partition_bfs(row, col, n, p, nb)
        else:
            labels = np.minimum(np.arange(n) // nb, p - 1)
        lr, lc = labels[row], labels[col]
        edges_per = np.bincount(lr, minlength=p)
        halo_per = np.zeros(p, np.int64)
        for s in range(p):
            remote = col[(lr == s) & (lc != s)]
            halo_per[s] = len(np.unique(remote))
        halo_bytes = halo_per.max() * d * DTYPE_BYTES
        slots_shard = int(edges_per.max())
        t_comp = T_SPMM_1CHIP * (slots_shard / e)
        comp_src = "model"
        if measured:
            for r in measured:
                if (r.get("kind") == kind and r.get("method") == method
                        and r.get("shards") == p):
                    t_comp = r["t_comp_ms"] / 1e3
                    comp_src = "measured"
        t_halo = halo_bytes / ICI_BW
        eff_overlap = t_comp / max(t_comp, t_halo)
        eff_serial = t_comp / (t_comp + t_halo)
        rows.append(dict(
            kind=kind, shards=p, edges_max=int(edges_per.max()),
            halo_nodes_max=int(halo_per.max()),
            halo_mb=halo_bytes / 1e6,
            cut_frac=float(halo_per.sum() / e),
            t_comp_ms=t_comp * 1e3, t_halo_ms=t_halo * 1e3,
            eff_overlap=eff_overlap, eff_serial=eff_serial,
            comp_src=comp_src))
    return e, rows


def parity_check():
    """sharded halo SpMM == single-device SpMM on the virtual CPU mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from graphax.dist.partition import partition_graph, shard_nodes, \
        unshard_nodes
    from graphax.dist.sharded import sharded_spmm_halo
    from graphax.sparse import Graph, ops

    rng = np.random.RandomState(0)
    n, e, d = 700, 4200, 24
    row = rng.randint(0, n, e); col = rng.randint(0, n, e)
    keep = row != col; row, col = row[keep], col[keep]
    order = np.lexsort((col, row))
    w = (rng.rand(len(order)) + 0.1).astype(np.float32)
    g = Graph.from_edges(row[order], col[order], n, edge_weight=w)
    x = rng.randn(n, d).astype(np.float32)

    want = ops.spmm(g.row, g.col, g.edge_weight, jnp.asarray(x), n)
    results = {}
    for p in (2, 4, 8):
        part = partition_graph(g, p)
        mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
        f = sharded_spmm_halo(mesh, part)
        xs = jnp.asarray(shard_nodes(x, part))
        got = unshard_nodes(np.asarray(f(xs)), part)
        err = float(np.abs(got - np.asarray(want)[:n]).max())
        results[p] = err
    return results


def main(out_path="SCALING.md", measured_path=None):
    import json as _json

    measured = None
    if measured_path and os.path.exists(measured_path):
        with open(measured_path) as f:
            measured = _json.load(f)
    shards = (2, 4, 8, 16)
    n, d = 169_343, 162
    sections = []
    for kind in ("uniform", "sbm"):
        for method in ("contiguous", "bfs"):
            e, rows = analyze(kind, n, d, shards, method=method,
                              measured=measured)
            sections.append((f"{kind}/{method}", e, rows))
    parity = parity_check()

    with open(out_path, "w") as f:
        f.write("# SCALING — edge-partitioned multi-chip model\n\n")
        f.write(
            "Hardware: one v5e chip is available, so multi-chip numbers are\n"
            "(a) **exact communication volumes** from the partition tables,\n"
            "(b) per-shard local compute T_comp — rows marked (measured)\n"
            "are timed ON THE REAL CHIP by building the straggler shard's\n"
            "halo-extended tiled SpMM from the actual partition tables\n"
            "(scripts/measure_shard_comp.py); unmarked rows use the\n"
            "analytic slots-scaled model anchored to the measured\n"
            f"single-chip SpMM RHS ({T_SPMM_1CHIP*1e3:.1f} ms, bench.py),\n"
            f"assuming {ICI_BW/1e9:.0f} GB/s one-way ICI per chip, and\n"
            "(c) **numerical parity** of the sharded path on a virtual CPU "
            "mesh.\n\n"
            "Design (graphax.dist): contiguous row blocks per chip, edges "
            "live with their aggregation row, one `all_to_all` of boundary "
            "node features per RHS evaluation (halo), overlappable with the "
            "local-block SpMM (double buffering).\n\n")
        for kind, e, rows in sections:
            base = ("uniform random (worst case: no community structure)"
                    if kind.startswith("uniform") else
                    "40-community SBM (75% within-community edges, shuffled ids)")
            part = ("contiguous id blocks" if kind.endswith("contiguous")
                    else "native greedy region-growing partitioner")
            label = f"{base} — {part}"
            f.write(f"## {label} — N={n:,}, E={e:,}, D={d} bf16\n\n")
            f.write("| chips | edges/chip | halo nodes/chip | halo MB/NFE | "
                    "edge-cut frac | T_comp ms | T_halo ms | eff (overlap) | "
                    "eff (serial) |\n|---|---|---|---|---|---|---|---|---|\n")
            for r in rows:
                star = " (measured)" if r.get("comp_src") == "measured" \
                    else ""
                f.write(f"| {r['shards']} | {r['edges_max']:,} | "
                        f"{r['halo_nodes_max']:,} | {r['halo_mb']:.2f} | "
                        f"{r['cut_frac']:.2f} | {r['t_comp_ms']:.2f}{star} | "
                        f"{r['t_halo_ms']:.2f} | {r['eff_overlap']:.0%} | "
                        f"{r['eff_serial']:.0%} |\n")
            f.write("\n")
        f.write("## Sharded-path parity (virtual 8-device CPU mesh)\n\n")
        f.write("`sharded_spmm_halo` vs single-device SpMM, max abs error:\n\n")
        for p, err in parity.items():
            f.write(f"- {p} shards: {err:.2e}\n")
        f.write(
            "\nReading: real benchmark graphs have community structure but "
            "arbitrary node ids. The native greedy max-gain region-growing "
            "partitioner (graphax.native.partition_bfs, "
            "partition_graph(method='bfs')) recovers the communities and "
            "roughly halves the halo vs raw contiguous id blocks (8 chips: "
            "39.7 -> 20.8 MB/NFE, serial-bound efficiency 80% -> 89%); "
            "with the designed overlap the halo hides entirely under local "
            "compute through 16 chips. The uniform-random graph is the "
            "adversarial bound — no partitioner can help and the design "
            "degrades toward the all_gather strategy "
            "(`sharded_spmm_allgather`), which is why both are provided.\n")
    print(open(out_path).read())


if __name__ == "__main__":
    # whole report runs on the virtual CPU mesh (must configure pre-backend)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.md")
    ap.add_argument("--measured", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "shard_comp_measured.json"),
        help="JSON from measure_shard_comp.py (run on the TPU); rows "
             "matching (kind, method, shards) get measured T_comp")
    a = ap.parse_args()
    main(a.out, a.measured)
