"""Benchmark: edges/s/chip per ODE step (BASELINE.json metric).

Measures the hot kernel triple of graph neural diffusion — SDDMM (per-edge
Q·K) → segment softmax → SpMM — i.e. one transformer-attention RHS
evaluation (`src/function_transformer_attention.py:44-59` in the reference),
on an ogbn-arxiv-scale synthetic graph (169,343 nodes / ~2.3M directed
edges, the reference's largest workload, `src/best_params.py:7`).

``vs_baseline`` is the speedup over the *reference's own algorithm* — the
fork densifies every sparse product to [N, N] and matmuls
(`src/function_laplacian_diffusion.py:39-58`); that baseline is measured on
the same device at the largest size where the dense matrix fits, and its
edges/s are compared at that common size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np


def build_graph_arrays(n, avg_deg, seed=0):
    rng = np.random.RandomState(seed)
    e = n * avg_deg
    row = rng.randint(0, n, e).astype(np.int32)
    col = rng.randint(0, n, e).astype(np.int32)
    keep = row != col
    row, col = row[keep], col[keep]
    # sort by row for locality (host-side graph build does this)
    order = np.argsort(row, kind="stable")
    return row[order], col[order]


def timeit(fn, *args, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from graphax import Config
    from graphax.functions import get_function
    from graphax.functions.common import FuncState
    from graphax.sparse import Graph

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32

    # ---- main measurement: attention RHS at arxiv scale ----------------
    cfg = Config(function="transformer", heads=2, attention_dim=32,
                 hidden_dim=162, attention_type="scaled_dot",
                 self_loop_weight=1.0, add_source=False)
    n, avg_deg = 169_343, 14
    row, col = build_graph_arrays(n, avg_deg)
    e_real = len(row)
    g = Graph.from_edges(row, col, n)
    func = get_function(cfg, 162)
    params = func.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).randn(n, 162), dtype)
    fstate = FuncState(graph=g, x0=x)

    rhs = jax.jit(lambda p, xx: func.rhs(p, fstate, 0.0, xx))
    t_rhs = timeit(rhs, params, x)
    edges_per_s = e_real / t_rhs

    # ---- laplacian (pure SpMM) RHS at the same scale -------------------
    cfg_l = Config(function="laplacian", hidden_dim=162,
                   self_loop_weight=1.0, add_source=False)
    func_l = get_function(cfg_l, 162)
    params_l = func_l.init(jax.random.PRNGKey(0))
    rhs_l = jax.jit(lambda p, xx: func_l.rhs(p, fstate, 0.0, xx))
    t_spmm = timeit(rhs_l, params_l, x)

    # ---- reference-algorithm baseline (densify to [N,N]) ---------------
    # at the largest size the dense adjacency fits on-chip
    n_d = 4096
    row_d, col_d = build_graph_arrays(n_d, avg_deg, seed=2)
    e_d = len(row_d)
    g_d = Graph.from_edges(row_d, col_d, n_d)
    x_d = jnp.asarray(np.random.RandomState(3).randn(n_d, 162), dtype)
    w_d = jnp.asarray(np.random.RandomState(4).rand(e_d), dtype)

    def dense_rhs(w, xx):
        # the reference's sparse_multiply: build dense [N,N], then matmul
        a = jnp.zeros((n_d, n_d), dtype).at[g_d.row, g_d.col].add(w)
        return a @ xx - xx

    fstate_d = FuncState(graph=g_d.with_weights(w_d), x0=x_d)
    sparse_rhs_d = jax.jit(lambda xx: func_l.rhs(params_l, fstate_d, 0.0, xx))
    t_dense = timeit(jax.jit(dense_rhs), w_d, x_d)
    t_sparse_same = timeit(sparse_rhs_d, x_d)
    vs_baseline = t_dense / t_sparse_same

    print(json.dumps({
        "metric": "attention_rhs_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_baseline, 2),
        "platform": platform,
        "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
        "n_nodes": n,
        "n_edges": e_real,
        "t_attention_rhs_ms": round(t_rhs * 1e3, 3),
        "t_spmm_rhs_ms": round(t_spmm * 1e3, 3),
        "spmm_edges_per_s": round(e_real / t_spmm, 1),
        "baseline": "reference densify-to-NxN algorithm on same device "
                    f"(N={n_d}): {t_dense*1e3:.2f}ms dense vs "
                    f"{t_sparse_same*1e3:.2f}ms sparse",
    }))


if __name__ == "__main__":
    main()
