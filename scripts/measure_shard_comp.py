"""Measure per-shard LOCAL compute time on the real chip.

The multi-chip per-NFE time is T = max(T_comp, T_halo) with overlap (serial:
T_comp + T_halo). T_halo is ICI-bound and not measurable on one chip, but
T_comp IS: each shard's local work — the tiled SpMM over its own edges
against the halo-extended feature block [Nb + H, D] — is exactly what this
script builds from the real `EdgePartition` tables and times with the
bench's chained-scan methodology. Feed the JSON into
`scaling_report.py --measured <file>` to replace the analytic
slots-scaled T_comp estimates with measured numbers.

Run on the TPU (no JAX_PLATFORMS override): one shard's compute at a time,
picking the max-edge shard (the straggler that sets the step time).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def measure(kind: str, method: str, shards=(2, 4, 8, 16), n=169_343, d=162,
            avg_deg=14):
    import jax
    import jax.numpy as jnp

    from bench import bench_chained
    from scaling_report import build_graph
    from graphax.dist.partition import partition_graph
    from graphax.kernels.pallas_tiled import blocked_values, spmm_pallas
    from graphax.kernels.tiles import build_row_tiles
    from graphax.sparse import Graph

    row, col = build_graph(kind, n, avg_deg)
    g = Graph.from_edges(row, col, n)
    dtype = (jnp.bfloat16 if jax.devices()[0].platform in ("tpu", "axon")
             else jnp.float32)
    rng = np.random.RandomState(0)
    out = []
    for p in shards:
        part = partition_graph(g, p, method=method)
        edges_per = part.edge_mask.sum(axis=1)
        s = int(np.argmax(edges_per))           # straggler shard
        m = part.edge_mask[s]
        lr = part.local_row[s][m].astype(np.int64)
        lc = part.local_col[s][m].astype(np.int64)
        w = part.edge_weight[s][m].astype(np.float32)
        order = np.lexsort((lc, lr))
        lr, lc, w = lr[order], lc[order], w[order]
        n_ext = part.block_size + part.halo_size

        # local tiled layout over the shard's rows; cols address the
        # halo-extended block — identical structure to dist/sharded.py's
        # per-shard compute after the all_to_all lands
        tiles = build_row_tiles(lr, lc, part.block_size)
        ot = np.lexsort((lr, lc))
        tiles_t = build_row_tiles(lc[ot], lr[ot], n_ext)
        wb = blocked_values(jnp.asarray(w), tiles)
        wb_t = blocked_values(jnp.asarray(w[ot]), tiles_t)
        x_ext = jnp.asarray(rng.randn(n_ext, d), dtype)

        def step(xx):
            y = spmm_pallas(wb, wb_t, xx, tiles, tiles_t)  # [Nb, D]
            return xx.at[: part.block_size].set(
                xx[: part.block_size] * 0.99 + y.astype(dtype) * 0.01)

        t = bench_chained(step, x_ext)
        out.append(dict(kind=kind, method=method, shards=p,
                        edges=int(edges_per[s]),
                        t_comp_ms=round(t * 1e3, 3)))
        print(out[-1], file=sys.stderr, flush=True)
    return out


def main():
    rows = []
    for kind, method in (("sbm", "bfs"), ("sbm", "contiguous"),
                         ("uniform", "contiguous")):
        rows += measure(kind, method)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "shard_comp_measured.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
