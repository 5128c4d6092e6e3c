"""Decompose the Pallas attention TRAINING backward at arxiv scale: where
do the ~150ms go? Run on TPU from the repo root."""

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
    from graphax.functions import get_function
    from graphax.functions.common import prepare_scalars
    from graphax.kernels.dispatch import attach_tiles
    from graphax.sparse import Graph
    from graphax.blocks.common import make_fstate

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
    tiles, tiles_t = g.tiles, g.tiles_t
    B, Eb = tiles.col.shape
    heads, a_dim = cfg.heads, cfg.attention_dim
    T, tile = tiles.num_tiles, tiles.tile

    from graphax.kernels.pallas_attention import (
        _bwd1_call, _bwd2_call, fused_attention_ax_pallas)
    from graphax.kernels.pallas_tiled import _spmm_call, _tile_rows

    gg = jnp.asarray(rng.randn(n, d), dtype)
    scores = jnp.asarray(rng.randn(B, heads, Eb) * 0.1, jnp.float32)
    shift = jnp.zeros((T, heads, tile), jnp.float32)
    denom = jnp.full((T, heads, tile), 7.0, jnp.float32)
    perm = tiles_t.perm_from_row
    Bt, Ebt = tiles_t.col.shape

    results = {}

    def timeit(name, fn, *args):
        rtt = _round_trip()
        jfn = jax.jit(fn)
        float(jfn(*args))
        t = max(min(_time_fetch(jfn, *args) for _ in range(3)) - rtt, 1e-9)
        results[name] = round(t * 1e3, 2)

    # full vjp (fwd+bwd) of the Pallas path
    def full_vjp(xx):
        y, vjp = jax.vjp(lambda v: fused_attention_ax_pallas(
            cfg, p["att"], tiles, v, tiles_t=tiles_t), xx)
        (dx,) = vjp(gg)
        return jnp.sum(dx.astype(jnp.float32)[::512, ::64])

    timeit("full_vjp_ms", full_vjp, x)

    # kernels B1+B2 together (incl. the xg gather, shared)
    def b12(xx, ggg):
        xg = xx[tiles.col]
        gt = _tile_rows(ggg.astype(jnp.float32), T, tile)
        am, ah, da, rho = _bwd1_call(scores, shift, denom, gt, xg,
                                     tiles.local_row, tiles.tile_idx, T,
                                     tile)
        q = jnp.asarray(rng.randn(n, a_dim), dtype)
        qt = _tile_rows(q, T, tile)
        wk = p["att"]["K"]["w"].astype(dtype)
        bk = p["att"]["K"]["b"].astype(jnp.float32)[None, :]
        dq, dke = _bwd2_call(heads, ah, da, rho, qt, xg, wk, bk,
                             tiles.local_row, tiles.tile_idx, T, tile)
        return (jnp.sum(am) + jnp.sum(rho) + jnp.sum(dq)
                + jnp.sum(dke[::512, ::64]))

    timeit("b1_b2_ms", b12, x, gg)

    # the transpose tail: perm gathers + both transpose spmm calls
    dke = jnp.asarray(rng.randn(B * Eb, a_dim), jnp.float32)
    amean = jnp.asarray(rng.rand(B, Eb), jnp.float32)

    def tail(ggg, dkef, am):
        a_t = jnp.where(tiles_t.slot_mask,
                        am.reshape(-1)[perm].reshape(Bt, Ebt), 0.0)
        gx = ggg[tiles_t.col]
        dxv = _spmm_call(gx, a_t, tiles_t.local_row, tiles_t.tile_idx,
                         tiles_t.num_tiles, tiles_t.tile)
        dk_t = dkef[perm].reshape(Bt, Ebt, a_dim)
        ones_t = tiles_t.slot_mask.astype(jnp.float32)
        dkc = _spmm_call(dk_t, ones_t, tiles_t.local_row, tiles_t.tile_idx,
                         tiles_t.num_tiles, tiles_t.tile)
        return jnp.sum(dxv[::64, ::8, ::8]) + jnp.sum(dkc[::64, ::8, ::8])

    timeit("transpose_tail_ms", tail, gg, dke, amean)

    # isolate: the [E, A] perm gather alone, and the scalar perm gather
    timeit("perm_dk_gather_ms",
           lambda v: jnp.sum(v[perm][::512, ::16]), dke)
    timeit("perm_scalar_gather_ms",
           lambda v: jnp.sum(v.reshape(-1)[perm][::512]), amean)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
