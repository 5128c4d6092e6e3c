"""Break the single-chip model eval forward (64 ms/NFE measured by
profile_shard_gap.py vs the 18 ms/NFE isolated RHS) into its per-forward
pieces: normalize_graph, the block-level attention pinning, make_fstate
table prep (blocked_values x2), the pure odeint solve, and encode/decode.

All timed under one jit each with SCALAR outputs (the tunneled platform
makes fetching large outputs dominate otherwise).

Usage (on the TPU): python scripts/profile_fwd_breakdown.py
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


def timeit(fn, *args, reps=3, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    rtt = _round_trip()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 0.0)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from scaling_report import build_graph
    from graphax import Config
    from graphax.blocks.common import integrate, make_fstate, \
        normalize_graph
    from graphax.functions import (
        get_function, transformer_attention_apply,
    )
    from graphax.functions.common import prepare_scalars
    from graphax.kernels.dispatch import attach_tiles
    from graphax.models import make_gnn
    from graphax.sparse import Graph

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
    g0 = Graph.from_edges(row, col, n)
    g_tiled = dataclasses.replace(attach_tiles(g0), strategy="tiled")

    single = make_gnn(cfg, d, 40)
    params, state = single.init(jax.random.PRNGKey(0))
    x1 = jnp.asarray(rng.randn(n, d), dtype)
    res = {}

    # 1. normalize_graph
    @jax.jit
    def t_norm(x):
        g = normalize_graph(cfg, g_tiled)
        return jnp.sum(g.edge_weight.astype(jnp.float32)) + x

    res["normalize_graph_ms"] = round(timeit(t_norm, 0.0) * 1e3, 2)

    g = normalize_graph(cfg, g_tiled)

    # 2. block-level attention pinning (XLA per-edge apply)
    @jax.jit
    def t_att(x):
        att, _ = transformer_attention_apply(
            params["block"]["att_layer"], cfg, g, x)
        return jnp.sum(att.astype(jnp.float32))

    res["block_attention_ms"] = round(timeit(t_att, x1) * 1e3, 2)

    att = jax.jit(lambda x: transformer_attention_apply(
        params["block"]["att_layer"], cfg, g, x)[0].mean(axis=1))(x1)

    # 3. make_fstate (blocked_values x2 etc.)
    @jax.jit
    def t_fs(x):
        fs = make_fstate(g, x, attention=att, train=False)
        leaves = [l for l in jax.tree_util.tree_leaves(fs.wb)
                  if hasattr(l, "astype")]
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves[:1])

    res["make_fstate_ms"] = round(timeit(t_fs, x1) * 1e3, 2)

    # 4. the pure solve (fstate prebuilt OUTSIDE the jit)
    func = get_function(cfg, d)
    fs = jax.jit(lambda x: make_fstate(g, x, attention=att,
                                       train=False))(x1)

    @jax.jit
    def t_solve(x):
        out = integrate(cfg, func, params["block"]["func"], fs, x,
                        train=False)
        return jnp.sum(out.z.astype(jnp.float32))

    t4 = timeit(t_solve, x1)
    res["solve_ms"] = round(t4 * 1e3, 2)
    res["solve_ms_per_nfe"] = round(t4 * 1e3 / 16, 2)

    # 4b. solve with the RHS called through a plain scan (no _rk_step):
    # 16 euler steps — isolates tableau/stage-combination overhead
    from graphax.functions.common import FuncState

    p_att = prepare_scalars(params["block"]["func"], cfg, dtype)

    @jax.jit
    def t_scan(x):
        def body(z, _):
            dz = func.rhs(p_att, fs, 0.0, z)
            return (z + 0.0625 * dz).astype(z.dtype), None

        z, _ = jax.lax.scan(body, x, None, length=16)
        return jnp.sum(z.astype(jnp.float32))

    t4b = timeit(t_scan, x1)
    res["plain_scan16_ms"] = round(t4b * 1e3, 2)
    res["plain_scan16_ms_per_nfe"] = round(t4b * 1e3 / 16, 2)

    # 5. encode + decode only
    @jax.jit
    def t_encdec(x):
        x0, st = single.encode(params, state, x, train=False)
        return jnp.sum(single.decode(params, x0[:, :cfg.hidden_dim])
                       .astype(jnp.float32))

    res["encode_decode_ms"] = round(timeit(t_encdec, x1) * 1e3, 2)

    # 6. full model apply (the 64 ms/NFE number)
    fwd = jax.jit(lambda x: jnp.sum(
        single.apply(params, state, g_tiled, x, train=False)[0]
        .astype(jnp.float32)))
    t6 = timeit(fwd, x1)
    res["full_apply_ms"] = round(t6 * 1e3, 2)
    res["accounted_ms"] = round(sum(
        res[k] for k in ("normalize_graph_ms", "block_attention_ms",
                         "make_fstate_ms", "solve_ms",
                         "encode_decode_ms")), 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
