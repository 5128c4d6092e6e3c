"""Itemize the 1-shard sharded-vs-single-chip gap (VERDICT r4 item 1).

SCALING.md r4 reports the sharded arxiv-scale transformer at 62 ms/NFE
(eval) and 122 ms/NFE (train) vs the single-chip 14/60 ms — but those
baselines were measured at heads=2 / attention_dim=32 while the sharded
model runs heads=4 / attention_dim=160.  This script measures every layer
of the stack at the SAME config (transformer, heads=4, attention_dim=160,
hidden 162, bf16, arxiv-scale SBM) on the real chip:

  1. single-chip fused attention RHS (dispatch path), per NFE
  2. single-chip full model eval forward (make_gnn), per NFE
  3. sharded _x_ext alone (halo exchange + concat), per call
  4. sharded _rhs isolated (shard_map chained scan), per NFE
  5. sharded full eval forward (forward_logits), per NFE

(4)-(1) = wrapper overhead inside the RHS;  (5)-(4) = solver overhead.

Usage (on the TPU): python scripts/profile_shard_gap.py [quick]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np

_RTT = None


def _round_trip():
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


def _once(run, *args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def chained(fn, state, *args, iters=8, warmup=2, reps=3):
    """Time fn(state, *args) -> state chained `iters` times under one jit."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(s, *a):
        out = lax.scan(lambda c, _: (fn(c, *a), None), s, None,
                       length=iters)[0]
        return jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))

    rtt = _round_trip()
    for _ in range(warmup):
        float(run(state, *args))
    t = min(_once(run, state, *args) for _ in range(reps))
    return max(t - rtt, 1e-9) / iters


def main(quick=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from scaling_report import build_graph
    from graphax import Config
    from graphax.dist import make_mesh
    from graphax.dist.mesh import ensure_varying_tree
    from graphax.dist.model import make_sharded_gnn, normalized_partition
    from graphax.dist.partition import shard_nodes
    from graphax.functions import get_function
    from graphax.functions.common import prepare_scalars
    from graphax.blocks.common import make_fstate
    from graphax.kernels.dispatch import attach_tiles
    from graphax.sparse import Graph
    import dataclasses

    n, d, avg_deg = 169_343, 162, 14
    cfg = Config(
        block="attention", function="transformer", hidden_dim=d, heads=4,
        attention_dim=(d // 4) * 4, attention_type="scaled_dot",
        method="rk4", step_size=0.25, time=1.0, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0, lr=0.005,
        no_early=True, dtype="bfloat16")
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    row, col = build_graph("sbm", n, avg_deg)
    g = Graph.from_edges(row, col, n)
    res = {"e": int(g.num_edges)}

    # ---- 1. single-chip RHS at the SAME config -------------------------
    g_tiled = dataclasses.replace(attach_tiles(g), strategy="tiled")
    f_att = get_function(cfg, d)
    p_att = prepare_scalars(f_att.init(jax.random.PRNGKey(0)), cfg, dtype)
    fs = make_fstate(g_tiled, jnp.zeros((n, d), dtype), train=False)
    x1 = jnp.asarray(rng.randn(n, d), dtype)

    def rhs_step(s):
        return (s * 0.99
                + f_att.rhs(p_att, fs, 0.0, s).astype(s.dtype) * 0.01)

    t1 = chained(rhs_step, x1)
    res["single_rhs_ms"] = round(t1 * 1e3, 2)
    print(f"1. single-chip RHS (h=4, ad=160): {t1*1e3:.2f} ms/NFE",
          flush=True)

    # ---- 2. single-chip full model eval forward ------------------------
    from graphax.models import make_gnn

    single = make_gnn(cfg, d, 40)
    sp, sstate = single.init(jax.random.PRNGKey(0))
    # scalar output: fetching the [N, 40] logits through the tunnel costs
    # ~610 ms and dominates otherwise (SCALING.md r5)
    fwd = jax.jit(lambda gg, x: jnp.sum(
        single.apply(sp, sstate, gg, x, train=False)[0]
        .astype(jnp.float32)))

    t0 = time.perf_counter()
    _ = float(fwd(g_tiled, x1))
    print(f"   (single fwd compile {time.perf_counter()-t0:.1f}s)",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fwd(g_tiled, x1))
        ts.append(time.perf_counter() - t0)
    nfe1 = 16
    t2 = min(ts)
    res["single_eval_ms_per_nfe"] = round(t2 * 1e3 / nfe1, 2)
    print(f"2. single-chip eval fwd: {t2*1e3:.1f} ms "
          f"({t2*1e3/nfe1:.2f} ms/NFE @ {nfe1} NFE)", flush=True)

    # ---- sharded model --------------------------------------------------
    mesh = make_mesh((1,), ("graph",))
    part = normalized_partition(cfg, g, 1)
    sh = make_sharded_gnn(mesh, part, cfg, d, 40, local_tiles="auto")
    ints = sh.internals
    nb, axis = ints["nb"], ints["axis_name"]
    tables = ints["tables"]() if callable(ints["tables"]) \
        else ints["tables"]
    params, state = sh.init(jax.random.PRNGKey(0))

    xs = jnp.asarray(shard_nodes(rng.randn(n, d).astype(np.float32), part))
    gspec = P(axis)
    tspec = {k: gspec for k in tables}
    rep_sh = NamedSharding(mesh, P())
    g_sh = NamedSharding(mesh, gspec)

    # Cases 3/4 return SCALARS (psum'd sums): fetching the full [P, Nb, D]
    # state through the axon tunnel costs ~186 ms/call and swamped the
    # r5-first-cut measurements (see SCALING.md r5).

    # ---- 3. x_ext alone -------------------------------------------------
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(gspec, tspec), out_specs=P())
    def xext_chain(xs_, tbl):
        tl = {k: v[0] for k, v in tbl.items()}
        z0 = xs_[0].astype(dtype)

        def body(z, _):
            xe = ints["x_ext"](z, tl)
            return (z * 0.99 + xe[:nb] * 0.01).astype(z.dtype), None

        z, _ = lax.scan(body, z0, None, length=8)
        return jax.lax.psum(jnp.sum(z.astype(jnp.float32)), axis)

    xc = jax.jit(xext_chain, in_shardings=(g_sh, g_sh),
                 out_shardings=rep_sh)

    def run3():
        return float(xc(xs, tables))

    run3(); run3()
    rtt = _round_trip()
    t3 = (min(_once(lambda: jnp.asarray(run3())) for _ in range(3)) - rtt) / 8
    res["shard_xext_ms"] = round(t3 * 1e3, 2)
    print(f"3. sharded _x_ext alone: {t3*1e3:.2f} ms/call", flush=True)

    # ---- 4. sharded RHS isolated ---------------------------------------
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), gspec, tspec), out_specs=P())
    def rhs_chain(p, xs_, tbl):
        p = ensure_varying_tree(p, axis)
        tl = {k: v[0] for k, v in tbl.items()}
        z0 = xs_[0].astype(dtype)
        prep = prepare_scalars(p["block"]["func"], cfg, dtype)
        diff = {"vals": None, "x0": jnp.zeros_like(z0)}

        def body(z, _):
            dz = ints["rhs"](prep, diff, tl, 0.0, z)
            return (z * 0.99 + dz * 0.01).astype(z.dtype), None

        z, _ = lax.scan(body, z0, None, length=8)
        return jax.lax.psum(jnp.sum(z.astype(jnp.float32)), axis)

    rc = jax.jit(rhs_chain, in_shardings=(rep_sh, g_sh, g_sh),
                 out_shardings=rep_sh)

    def run4():
        return float(rc(params, xs, tables))

    run4(); run4()
    t4 = (min(_once(lambda: jnp.asarray(run4())) for _ in range(3)) - rtt) / 8
    res["shard_rhs_ms"] = round(t4 * 1e3, 2)
    print(f"4. sharded RHS isolated: {t4*1e3:.2f} ms/NFE "
          f"(wrapper overhead vs single RHS: {(t4-t1)*1e3:+.2f} ms)",
          flush=True)

    # ---- 5. sharded full eval forward (scalar sync) --------------------
    sum_l = jax.jit(lambda l: jnp.sum(l.astype(jnp.float32)))

    def run5():
        return float(sum_l(sh.forward_logits(params, state, xs)))

    t0 = time.perf_counter()
    run5()
    print(f"   (sharded fwd compile {time.perf_counter()-t0:.1f}s)",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run5()
        ts.append(time.perf_counter() - t0)
    t5 = min(ts)
    res["shard_eval_ms_per_nfe"] = round(t5 * 1e3 / nfe1, 2)
    print(f"5. sharded eval fwd: {t5*1e3:.1f} ms ({t5*1e3/nfe1:.2f} ms/NFE; "
          f"solver overhead vs isolated RHS: "
          f"{(t5/nfe1-t4)*1e3:+.2f} ms/NFE)", flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main(quick=len(sys.argv) > 1 and sys.argv[1] == "quick")
