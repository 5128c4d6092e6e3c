"""Decompose the windowed attention RHS time at arxiv scale: Pallas dense
kernel vs XLA residual path vs projections. Run on TPU."""

import dataclasses
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _round_trip, _time_fetch, bench_chained, _RTT
    from graphax import Config
    from graphax.kernels.dispatch import attach_windows
    from graphax.kernels.windows import community_order
    from graphax.sparse import Graph

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
    print("tiles", wt.num_tiles, "blocks", wt.num_blocks,
          "in-frac", wt.in_window_edges / len(rs),
          "res blocks", wt.residual.num_blocks,
          "res slots", wt.residual.slot_mask.shape)

    dtype = jnp.bfloat16
    x = jnp.asarray(rng.randn(n, d), dtype)
    cfg = Config(function="transformer", heads=2, attention_dim=32,
                 hidden_dim=d, attention_type="scaled_dot",
                 self_loop_weight=1.0)
    from graphax.functions.common import init_alpha_beta, prepare_scalars
    from graphax.functions.transformer import transformer_attention_init
    p0 = init_alpha_beta(cfg)
    p0["att"] = transformer_attention_init(jax.random.PRNGKey(0), cfg, d)
    p = prepare_scalars(p0, cfg, dtype)["att"]

    from graphax.kernels.pallas_winatt import (
        _make_winatt, _winatt_call, _slab_pad, windowed_attention_ax_pallas,
    )
    from graphax.kernels.windowed_attention import (
        _residual_scores, windowed_attention_ax,
    )
    from graphax.kernels.fused_attention import NEG, _reduce_rows
    from graphax.utils.params import linear_apply

    heads, d_k = cfg.heads, cfg.attention_dim // cfg.heads
    t_tiles, tile = wt.num_tiles, wt.tile

    # --- full paths -------------------------------------------------------
    def full_pallas(s, _):
        return s * 0.99 + windowed_attention_ax_pallas(cfg, p, g, s) * 0.01

    def full_xla(s, _):
        return s * 0.99 + windowed_attention_ax(cfg, p, g, s) * 0.01

    t_full = bench_chained(full_pallas, x, None)
    print(f"full pallas-windowed RHS: {t_full*1e3:.2f} ms")
    t_fxla = bench_chained(full_xla, x, None)
    print(f"full XLA-windowed RHS:    {t_fxla*1e3:.2f} ms")

    # --- kernel only (zero residual denominators) --------------------------
    pad_rows = t_tiles * tile - n

    def kernel_only(s, _):
        q = linear_apply(p["Q"], s).astype(dtype)
        k = linear_apply(p["K"], s).astype(dtype)
        q_tiles = jnp.pad(q, ((0, pad_rows), (0, 0))).reshape(t_tiles, tile, -1)
        k_slab = _slab_pad(k, wt.num_windows, wt.window)
        x_slab = _slab_pad(s, wt.num_windows, wt.window)
        d_res_t = jnp.zeros((t_tiles, heads, tile), jnp.float32)
        scal = jnp.zeros((1, 4), jnp.float32)
        out, _dn = _winatt_call("scaled_dot", False, heads, d_k, q_tiles,
                                k_slab, x_slab, wt.dense_mask, d_res_t,
                                scal, wt.tile_win,
                                jnp.zeros((1, tile, wt.window), dtype))
        out = out.reshape(t_tiles * tile, -1)[:n]
        return s * 0.99 + out.astype(dtype) * 0.01

    t_kern = bench_chained(kernel_only, x, None)
    print(f"dense kernel only:        {t_kern*1e3:.2f} ms")

    # --- residual scores+reduce only ---------------------------------------
    def residual_only(s, _):
        q = linear_apply(p["Q"], s).astype(dtype)
        s_res, oh, xg = _residual_scores(cfg, p, wt.residual, s, q,
                                         g.edge_weight)
        r0 = jnp.max(s_res)
        e_res = jnp.where(wt.residual.slot_mask[..., None],
                          jnp.exp(s_res - r0), 0.0).astype(dtype)
        d_res = _reduce_rows(oh, e_res, wt.residual)
        w_res = jnp.where(wt.residual.slot_mask, e_res.mean(-1), 0.0)
        vb = xg * w_res[..., None]
        out = _reduce_rows(oh, vb, wt.residual)[:n]
        return s * 0.99 + out.astype(dtype) * 0.01

    t_res = bench_chained(residual_only, x, None)
    print(f"residual path only:       {t_res*1e3:.2f} ms")

    # --- projections only ---------------------------------------------------
    def proj_only(s, _):
        q = linear_apply(p["Q"], s).astype(dtype)
        k = linear_apply(p["K"], s).astype(dtype)
        return s * 0.99 + (q.sum(-1)[:, None] + k.sum(-1)[:, None]) \
            .astype(dtype) * 0.01

    t_proj = bench_chained(proj_only, x, None)
    print(f"q/k projections only:     {t_proj*1e3:.2f} ms")


if __name__ == "__main__":
    main()
