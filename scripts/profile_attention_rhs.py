"""Stage-by-stage timing of the tiled attention RHS at ogbn-arxiv scale.

Breaks the 18.6 ms/NFE (bench.py) into: the E-sized row gather, each of the
three Pallas kernels (scores / normalize / spmm), and the XLA glue — to
decide where the next factor comes from (flash-style single-pass fusion vs
gather layout).
"""

import dataclasses
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_RTT = None


def _round_trip():
    """On the tunneled device platform block_until_ready returns before the
    computation runs; only a host fetch is a real sync. Measure its cost."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        tiny = jax.jit(lambda v: v * 2.0)
        x = jnp.ones(())
        float(tiny(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(tiny(x))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def chained(fn, state, *args, iters=10, warmup=2):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(s, *a):
        out = lax.scan(lambda c, _: (fn(c, *a), None), s, None,
                       length=iters)[0]
        return jnp.sum(out.astype(jnp.float32))

    rtt = _round_trip()
    for _ in range(warmup):
        float(run(state, *args))
    t = min(_once(run, state, *args) for _ in range(3))
    return max(t - rtt, 1e-9) / iters


def _once(run, *args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from graphax import Config
    from graphax.functions import get_function
    from graphax.functions.common import FuncState, prepare_scalars
    from graphax.blocks.common import make_fstate
    from graphax.kernels.dispatch import attach_tiles
    from graphax.sparse import Graph

    rng = np.random.RandomState(1)
    n, avg_deg, d = 169_343, 14, 162
    row = rng.randint(0, n, n * avg_deg)
    col = rng.randint(0, n, n * avg_deg)
    keep = row != col
    row, col = row[keep], col[keep]
    order = np.lexsort((col, row))
    row, col = row[order], col[order]

    g0 = Graph.from_edges(row, col, n)
    g_tiled = dataclasses.replace(attach_tiles(g0), strategy="tiled")
    tiles = g_tiled.tiles
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.randn(n, d), dtype)
    e = len(row)
    print(f"E={e} blocks={tiles.num_blocks} Eb={tiles.block_edges} "
          f"tile={tiles.tile} tiles={tiles.num_tiles}", flush=True)

    # ---- 1. the raw gather ------------------------------------------------
    t_col = tiles.col
    slots = int(np.prod(t_col.shape))
    gb = slots * d * x.dtype.itemsize / 1e9
    def gstep(s):
        xa = x + s[0, 0]
        return (xa[t_col].sum().reshape(1, 1) * 1e-9).astype(dtype)
    t_g = chained(gstep, jnp.zeros((1, 1), dtype))
    print(f"gather [B,Eb]->[B,Eb,{d}]: {t_g*1e3:.2f} ms  "
          f"({gb:.2f} GB -> {gb/t_g:.0f} GB/s effective)", flush=True)

    # gather with width padded to 256
    d_pad = 256
    x_pad = jnp.zeros((n, d_pad), dtype).at[:, :d].set(x)
    def gstep_p(s):
        xa = x_pad + s[0, 0]
        return (xa[t_col].sum().reshape(1, 1) * 1e-9).astype(dtype)
    t_gp = chained(gstep_p, jnp.zeros((1, 1), dtype))
    gbp = slots * d_pad * x.dtype.itemsize / 1e9
    print(f"gather padded d={d_pad}: {t_gp*1e3:.2f} ms ({gbp/t_gp:.0f} GB/s)",
          flush=True)

    # ---- 2. the full attention RHS (dispatch path) -------------------------
    cfg_att = Config(function="transformer", heads=2, attention_dim=32,
                     hidden_dim=d, attention_type="scaled_dot",
                     self_loop_weight=1.0)
    f_att = get_function(cfg_att, d)
    p_att = prepare_scalars(f_att.init(jax.random.PRNGKey(0)), cfg_att, dtype)
    fs = make_fstate(g_tiled, x, train=False)

    def rhs_step(s):
        return s * 0.99 + f_att.rhs(p_att, fs, 0.0, s).astype(s.dtype) * 0.01
    t_rhs = chained(rhs_step, x)
    print(f"full attention RHS: {t_rhs*1e3:.2f} ms", flush=True)

    # ---- 3. kernel stages in isolation (big arrays as jit args!) ----------
    from graphax.kernels import pallas_attention as pa

    heads = 2
    a_dim = 64
    wq = jnp.asarray(rng.randn(d, a_dim), dtype) * 0.05
    q = x @ wq
    q_tiles = pa._tile_rows(q, tiles.num_tiles, tiles.tile)
    xg = x[t_col]
    wk = jnp.asarray(rng.randn(d, a_dim), dtype) * 0.05
    bk = jnp.zeros((1, a_dim), jnp.float32)
    wb = jnp.zeros(t_col.shape, jnp.float32)
    scal = jnp.zeros((1, 2), jnp.float32)

    def k1(s, q_tiles, xg):
        return pa._scores_call(
            "scaled_dot", False, heads, q_tiles + s[0, 0, 0], xg, wk, bk,
            wb, tiles.local_row, tiles.tile_idx, scal,
            tiles.num_tiles, tiles.tile)[0][:1, :1, :1].astype(dtype)
    t_k1 = chained(k1, jnp.zeros((1, 1, 1), dtype), q_tiles, xg)
    print(f"K1 scores: {t_k1*1e3:.2f} ms", flush=True)

    scores, rmax = pa._scores_call(
        "scaled_dot", False, heads, q_tiles, xg, wk, bk, wb,
        tiles.local_row, tiles.tile_idx, scal, tiles.num_tiles, tiles.tile)
    shift = jnp.where(rmax <= pa.NEG / 2, 0.0, rmax)

    def k2(s, scores, shift):
        return pa._norm_call(False, scores + s[0, 0, 0], shift,
                             tiles.local_row, tiles.tile_idx,
                             tiles.num_tiles, tiles.tile)[0][:1, :1, :1]
    t_k2 = chained(k2, jnp.zeros((1, 1, 1), jnp.float32), scores, shift)
    print(f"K2 normalize: {t_k2*1e3:.2f} ms", flush=True)

    ee, denom = pa._norm_call(False, scores, shift, tiles.local_row,
                              tiles.tile_idx, tiles.num_tiles, tiles.tile)

    def k3(s, ee, denom, xg):
        return pa._attspmm_call(ee + s[0, 0, 0], denom, xg,
                                tiles.local_row, tiles.tile_idx,
                                tiles.num_tiles, tiles.tile)[:1, :1, :1]
    t_k3 = chained(k3, jnp.zeros((1, 1, 1), jnp.float32), ee, denom, xg)
    print(f"K3 spmm: {t_k3*1e3:.2f} ms", flush=True)

    print(f"sum: gather {t_g*1e3:.2f} + K1 {t_k1*1e3:.2f} + "
          f"K2 {t_k2*1e3:.2f} + K3 {t_k3*1e3:.2f} = "
          f"{(t_g+t_k1+t_k2+t_k3)*1e3:.2f} vs RHS {t_rhs*1e3:.2f} ms",
          flush=True)

    # ---- 4. width-free combined gather [x || x@Wk] (<=256 lanes) ----------
    xk = jnp.concatenate([x, (x @ wk)], axis=1)        # [N, 226]
    def gstep_xk(s, xk):
        xa = xk + s[0, 0]
        return (xa[t_col].sum().reshape(1, 1) * 1e-9).astype(dtype)
    t_gxk = chained(gstep_xk, jnp.zeros((1, 1), dtype), xk)
    print(f"gather [x||k] d=226: {t_gxk*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
