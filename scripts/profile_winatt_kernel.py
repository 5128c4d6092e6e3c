"""Variant timings for the dense windowed-attention kernel: isolate what
the 3.4 ms goes to (mask loads, VPU softmax, grid overhead, slab refetch).
Run on TPU."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import bench_chained
    from graphax.kernels.dispatch import attach_windows
    from graphax.kernels.windows import community_order
    from graphax.sparse import Graph
    from graphax.kernels.pallas_winatt import _winatt_call, _slab_pad

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
    o2 = np.lexsort((cs2, rs))
    g = attach_windows(Graph.from_edges(rs[o2], cs2[o2], n), window=window)
    wt = g.windows
    t_tiles, tile = wt.num_tiles, wt.tile

    dtype = jnp.bfloat16
    heads, d_k, att = 2, 16, 32
    x = jnp.asarray(rng.randn(n, d), dtype)
    q = jnp.asarray(rng.randn(n, att), dtype)
    k = jnp.asarray(rng.randn(n, att), dtype)
    pad_rows = t_tiles * tile - n
    q_tiles = jnp.pad(q, ((0, pad_rows), (0, 0))).reshape(t_tiles, tile, -1)
    k_slab = _slab_pad(k, wt.num_windows, window)
    x_slab = _slab_pad(x, wt.num_windows, window)
    d_res = jnp.zeros((t_tiles, heads, tile), jnp.float32)
    scal = jnp.zeros((1, 4), jnp.float32)
    dummy_w = jnp.zeros((1, tile, window), dtype)

    def step(variant_mask, hh):
        def f(s, _):
            out, _dn = _winatt_call("scaled_dot", False, hh, att // hh,
                                    q_tiles, k_slab, _slab_pad(
                                        s, wt.num_windows, window),
                                    variant_mask, d_res[:, :hh], scal,
                                    wt.tile_win, dummy_w)
            return s * 0.99 + out.reshape(t_tiles * tile, -1)[:n] \
                .astype(s.dtype) * 0.01
        return f

    t_i = bench_chained(step(wt.dense_mask, heads), x, None)
    print(f"kernel, int8 mask, tile=128, H=2:   {t_i*1e3:.2f} ms  "
          f"(T={t_tiles}, frac={wt.in_window_edges/len(rs):.3f})")

    # ---- tile = window: one grid step per 512-row window group ----------
    g2 = attach_windows(Graph.from_edges(rs[o2], cs2[o2], n), window=window,
                        tile=window)
    wt2 = g2.windows
    t2_tiles, tile2 = wt2.num_tiles, wt2.tile
    q_tiles2 = jnp.pad(q, ((0, t2_tiles * tile2 - n), (0, 0))) \
        .reshape(t2_tiles, tile2, -1)
    d_res2 = jnp.zeros((t2_tiles, heads, tile2), jnp.float32)
    dummy_w2 = jnp.zeros((1, tile2, window), dtype)

    def step2(s, _):
        out, _dn = _winatt_call("scaled_dot", False, heads, d_k,
                                q_tiles2, k_slab,
                                _slab_pad(s, wt2.num_windows, window),
                                wt2.dense_mask, d_res2, scal,
                                wt2.tile_win, dummy_w2)
        return s * 0.99 + out.reshape(t2_tiles * tile2, -1)[:n] \
            .astype(s.dtype) * 0.01

    t_g = bench_chained(step2, x, None)
    print(f"kernel, int8 mask, tile=512, H=2:   {t_g*1e3:.2f} ms  "
          f"(T={t2_tiles}, frac={wt2.in_window_edges/len(rs):.3f})")

    # windowed SpMM with tile=512 (laplacian path)
    from graphax.kernels.pallas_windows import densify_windows, spmm_windowed
    from graphax.kernels.windows import blocked_window_values

    for gg, name in ((g, "tile=128"), (g2, "tile=512")):
        win, res_v, res_t = blocked_window_values(gg.edge_weight, gg.windows)
        dense = densify_windows(win.astype(dtype), gg.windows)

        def spmm_step(s, dn, rv, rt, wtx):
            return s * 0.99 + spmm_windowed(dn, rv, rt, s, wtx) * 0.01

        import functools
        t_s = bench_chained(functools.partial(
            spmm_step, dn=dense, rv=res_v, rt=res_t, wtx=gg.windows), x)
        print(f"spmm windowed, {name}:              {t_s*1e3:.2f} ms")


if __name__ == "__main__":
    main()
