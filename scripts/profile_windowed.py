"""Component-level profile of the windowed SpMM (VERDICT r2 item 8).

Times the two kernels the windowed strategy composes — the block-dense
win_matmul and the residual gather SpMM — separately on the same graph
bench.py's windowed section builds, to itemize the 1.7x floor gap."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from graphax.kernels.dispatch import attach_windows
    from graphax.kernels.pallas_tiled import spmm_pallas
    from graphax.kernels.pallas_windows import (
        _make_win_matmul, densify_windows,
    )
    from graphax.kernels.windows import blocked_window_values, community_order
    from graphax.sparse import Graph

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    rng = np.random.RandomState(1)

    n, avg_deg, d = 169_343, 14, 162
    window = 512
    comm = rng.randint(0, n // window + 1, n)
    src = rng.randint(0, n, n * avg_deg)
    same = rng.rand(n * avg_deg) < 0.75
    dst = rng.randint(0, n, n * avg_deg)
    order_c = np.argsort(comm, kind="stable")
    starts = np.searchsorted(comm[order_c], np.arange(comm.max() + 1))
    ends = np.searchsorted(comm[order_c], np.arange(comm.max() + 1), "right")
    cs, ce = starts[comm[src]], ends[comm[src]]
    dst_in = order_c[cs + (rng.rand(n * avg_deg) * (ce - cs)).astype(np.int64)]
    dst = np.where(same, dst_in, dst)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    perm = community_order(src, dst, n, window=window)
    rs, cs2 = perm[src], perm[dst]
    order2 = np.lexsort((cs2, rs))
    rs, cs2 = rs[order2], cs2[order2]
    gw0 = Graph.from_edges(rs, cs2, n)
    g = attach_windows(gw0, window=window)
    wt = g.windows
    x = jnp.asarray(rng.randn(n, d), dtype)

    win, res, res_t = blocked_window_values(g.edge_weight, wt)
    dense = jax.jit(lambda v: densify_windows(v.astype(dtype), wt))(win)
    dense.block_until_ready()

    tiny = jax.jit(lambda v: v * 2.0)
    float(tiny(jnp.ones(())))
    rtt = min(_t(tiny, jnp.ones(())) for _ in range(5))

    def timed(name, fn, *args, iters=20):
        @jax.jit
        def run(x0, *a):
            def body(c, _):
                return c * 0.99 + fn(c, *a).astype(c.dtype) * 0.01, None
            out = jax.lax.scan(body, x0, None, length=iters)[0]
            return jnp.sum(out.astype(jnp.float32))

        float(run(x, *args))
        t = (min(_t(run, x, *args) for _ in range(3)) - rtt) / iters
        print(f"{name:24s} {t*1e3:7.3f} ms", file=sys.stderr)
        return t

    f_win = _make_win_matmul(wt.num_tiles, wt.tile, wt.window,
                             wt.num_windows, wt.num_nodes)

    t_full = timed("full windowed spmm", lambda c: (
        f_win(dense, c, wt.tile_win)
        + spmm_pallas(res, res_t, c, wt.residual, wt.residual_t)
        .astype(jnp.float32)).astype(c.dtype))
    t_win = timed("win_matmul only", lambda c:
                  f_win(dense, c, wt.tile_win).astype(c.dtype))
    t_res = timed("residual spmm only", lambda c:
                  spmm_pallas(res, res_t, c, wt.residual, wt.residual_t))

    res_edges = int(np.asarray(wt.residual.slot_mask).sum())
    n_blocks = int(wt.residual.edge_slot.shape[0])
    eb = int(wt.residual.edge_slot.shape[1])
    capacity = n_blocks * eb   # the gather is slot-bound over CAPACITY
    print(json.dumps({
        "platform": platform,
        "t_full_ms": round(t_full * 1e3, 3),
        "t_win_ms": round(t_win * 1e3, 3),
        "t_res_ms": round(t_res * 1e3, 3),
        "sum_parts_ms": round((t_win + t_res) * 1e3, 3),
        "in_window_frac": round(wt.in_window_edges
                                / int(np.asarray(gw0.num_edges)), 3),
        "residual": {
            "blocks": n_blocks, "block_edges": eb,
            "real_edges": res_edges,
            "capacity_slots": capacity,
            "slot_bytes_mb": round(capacity * d
                                   * jnp.dtype(dtype).itemsize / 1e6, 1),
        },
        "win": {
            "tiles": wt.num_tiles, "tile": wt.tile, "window": wt.window,
            "dense_mb": round(wt.num_tiles * wt.tile * wt.window
                              * jnp.dtype(dtype).itemsize / 1e6, 1),
        },
    }))


def _t(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
