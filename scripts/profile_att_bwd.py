"""Decompose the Pallas attention TRAINING backward at arxiv scale.

Current architecture (kernels.pallas_attention backward):
  B1 (row side): recompute α, emit ᾱ, α·h, dα, ρ  from scores/shift/denom
  B2 (row side): dq accumulation per row tile
  B3 (col side): dk_col + dx_val in one transpose-tile pass, fed by
      node-table gathers (q̃[tt_col], g[tt_col], shift/denom/ρ[tt_col])
Big slot-bound terms: xg = x[t_col] (row layout) and the B3-side gathers.
Run on TPU from the repo root. Everything rides jit ARGUMENTS (closed-over
constants run ~2x slower through the axon relay — see memory note).

Negative result (r3, measured): packing B3's five same-index gathers
(g, q̃, shift, denom, ρ over tt_col) into two wide gathers made the train
step SLOWER (65.8 ms vs 59.7 ms). Independent narrow gathers overlap each
other (the gather is latency-bound, and XLA pipelines them); one packed
wide gather serializes that latency. Single-call component timings below
are therefore upper bounds — inside the full program the gathers hide
behind each other."""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _round_trip, _time_fetch, build_sorted_edges
    from graphax import Config
    from graphax.blocks.common import make_fstate
    from graphax.functions import get_function
    from graphax.functions.common import prepare_scalars
    from graphax.kernels.dispatch import attach_tiles
    from graphax.sparse import Graph

    n, avg_deg, d = 169_343, 14, 162
    row, col = build_sorted_edges(n, avg_deg)
    g0 = Graph.from_edges(row, col, n)
    g = dataclasses.replace(attach_tiles(g0), strategy="tiled")
    rng = np.random.RandomState(1)
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.randn(n, d), dtype)
    cfg = Config(function="transformer", heads=2, attention_dim=32,
                 hidden_dim=d, attention_type="scaled_dot",
                 self_loop_weight=1.0)
    f = get_function(cfg, d)
    p = prepare_scalars(f.init(jax.random.PRNGKey(0)), cfg, dtype)
    fs = make_fstate(g, x, train=True, cfg=cfg)
    tiles, tiles_t = g.tiles, g.tiles_t
    B, Eb = tiles.col.shape
    Bt, Ebt = tiles_t.col.shape
    heads, a_dim = cfg.heads, cfg.attention_dim
    T, tile = tiles.num_tiles, tiles.tile
    Tt, tile_t = tiles_t.num_tiles, tiles_t.tile

    from graphax.kernels.pallas_attention import (
        _bwd1_call, _bwd2_call, _bwd3_call,
    )
    from graphax.kernels.pallas_tiled import _tile_rows

    gg_ct = jnp.asarray(rng.randn(n, d), dtype)   # incoming cotangent
    scores = jnp.asarray(rng.randn(B, heads, Eb) * 0.1, jnp.float32)
    shift = jnp.zeros((T, heads, tile), jnp.float32)
    denom = jnp.full((T, heads, tile), 7.0, jnp.float32)

    results = {}

    def timeit(name, fn, *args):
        rtt = _round_trip()
        jfn = jax.jit(fn)
        float(jfn(*args))
        t = max(min(_time_fetch(jfn, *args) for _ in range(3)) - rtt, 1e-9)
        results[name] = round(t * 1e3, 2)
        print(f"{name:26s} {t*1e3:7.2f} ms", file=sys.stderr)

    # full fwd+bwd of the training RHS (reference point ≈ bench train_step)
    def full_vjp(xx, fstate):
        y, vjp = jax.vjp(
            lambda v: f.rhs(p, fstate, 0.0, v).astype(jnp.float32), xx)
        (dx,) = vjp(gg_ct.astype(jnp.float32))
        return jnp.sum(dx.astype(jnp.float32)[::512, ::64])

    timeit("full_vjp_ms", full_vjp, x, fs)

    # fwd only
    timeit("fwd_ms", lambda xx, fstate: jnp.sum(
        f.rhs(p, fstate, 0.0, xx).astype(jnp.float32)[::512, ::64]), x, fs)

    # the two big D-wide slot gathers
    timeit("xg_row_gather_ms", lambda xx, c: jnp.sum(
        xx[c].astype(jnp.float32)[::64, ::64, ::64]), x, tiles.col)
    timeit("g_col_gather_ms", lambda xx, c: jnp.sum(
        xx[c].astype(jnp.float32)[::64, ::64, ::64]), gg_ct, tiles_t.col)
    # narrow B3-side gathers: q̃ [N, A] and a [N, heads] node table
    q0 = jnp.asarray(rng.randn(n, a_dim), dtype)
    nt = jnp.asarray(rng.randn(n, heads), jnp.float32)
    timeit("q_col_gather_ms", lambda qq, c: jnp.sum(
        qq[c].astype(jnp.float32)[::64, ::64, ::8]), q0, tiles_t.col)
    timeit("node_tbl_gather_ms", lambda tt, c: jnp.sum(
        tt[c][::64, ::64, :]), nt, tiles_t.col)

    # kernels B1+B2 (row side) including the shared xg gather
    def b12(xx, ggg, sc, sh, dn):
        xg = xx[tiles.col]
        gt = _tile_rows(ggg.astype(jnp.float32), T, tile)
        am, ah, da, rho = _bwd1_call(sc, sh, dn, gt, xg,
                                     tiles.local_row, tiles.tile_idx, T,
                                     tile)
        wk = p["att"]["K"]["w"].astype(dtype)
        bk = p["att"]["K"]["b"].astype(jnp.float32)[None, :]
        dq = _bwd2_call(heads, ah, da, rho, xg, wk, bk,
                        tiles.local_row, tiles.tile_idx, T, tile)
        return jnp.sum(am[::64]) + jnp.sum(rho[::64]) \
            + jnp.sum(dq[::64, ::8, ::8])

    timeit("b1_b2_incl_xg_ms", b12, x, gg_ct, scores, shift, denom)

    # B3 (col side) including its gathers
    def b3(xx, ggg, qq, sh, dn):
        rho_n = jnp.asarray(rng.randn(T * tile, heads), jnp.float32)[:n]
        sh_n = sh.transpose(0, 2, 1).reshape(T * tile, heads)[:n]
        dn_n = dn.transpose(0, 2, 1).reshape(T * tile, heads)[:n]
        wk = p["att"]["K"]["w"].astype(dtype)
        k = xx @ wk + p["att"]["K"]["b"].astype(xx.dtype)
        qg = qq[tiles_t.col]
        ggt = ggg[tiles_t.col]
        k_tiles = _tile_rows(k, Tt, tile_t)
        x_tiles = _tile_rows(xx, Tt, tile_t)
        se = sh_n[tiles_t.col]
        de = dn_n[tiles_t.col]
        re = rho_n[tiles_t.col]
        dkc, dxv = _bwd3_call(heads, qg, ggt, k_tiles, x_tiles, se, de,
                              re, tiles_t.local_row, tiles_t.tile_idx,
                              Tt, tile_t)
        return jnp.sum(dkc[::64, ::8, ::8]) + jnp.sum(dxv[::64, ::8, ::8])

    timeit("b3_incl_gathers_ms", b3, x, gg_ct, q0, shift, denom)

    results["slots_row"] = int(B * Eb)
    results["slots_col"] = int(Bt * Ebt)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
