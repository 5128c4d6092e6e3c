"""Isolate the sharded-transformer TRAIN-path regression (r4): time the
1-shard train step at arxiv scale as a function of NFE count and of the
attention dispatch, to locate where the backward time goes.

Usage: python scripts/profile_dist_bwd.py [quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np


def build(function, local_tiles, time_T, n=169_343, d=162, avg_deg=14):
    import jax
    import jax.numpy as jnp

    from scaling_report import build_graph
    from graphax import Config
    from graphax.dist import make_mesh
    from graphax.dist.model import make_sharded_gnn, normalized_partition
    from graphax.dist.partition import shard_nodes
    from graphax.sparse import Graph

    cfg = Config(
        block="attention", function=function, hidden_dim=d, heads=4,
        attention_dim=(d // 4) * 4, attention_type="scaled_dot",
        method="rk4", step_size=0.25, time=time_T, add_source=True,
        self_loop_weight=1.0, input_dropout=0.0, dropout=0.0, lr=0.005,
        no_early=True, dtype="bfloat16")
    row, col = build_graph("sbm", n, avg_deg)
    g = Graph.from_edges(row, col, n)
    rng = np.random.RandomState(0)
    mesh = make_mesh((1,), ("graph",))
    part = normalized_partition(cfg, g, 1)
    sharded = make_sharded_gnn(mesh, part, cfg, d, 40,
                               local_tiles=local_tiles)
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, 40, n)
    mask = rng.rand(n) < 0.5
    xs = jnp.asarray(shard_nodes(x, part))
    ys = jnp.asarray(shard_nodes(y[:, None], part))[..., 0].astype(jnp.int32)
    ms = jnp.asarray(shard_nodes(mask[:, None].astype(np.float32),
                                 part))[..., 0] > 0.5
    params, state = sharded.init(jax.random.PRNGKey(0))
    from graphax.train.optimizers import get_optimizer

    opt_state = get_optimizer(cfg.optimizer, cfg.lr, cfg.decay).init(params)
    return sharded, params, state, opt_state, xs, ys, ms


def timed(tag, sharded, params, state, opt_state, xs, ys, ms, steps=2):
    import jax

    t0 = time.time()
    out = sharded.train_step(params, state, opt_state, xs, ys, ms,
                             jax.random.PRNGKey(1))
    _ = float(np.ravel(np.asarray(out[3]))[0])
    compile_s = time.time() - t0
    times = []
    for _ in range(steps):
        t0 = time.time()
        out = sharded.train_step(params, state, opt_state, xs, ys, ms,
                                 jax.random.PRNGKey(1))
        _ = float(np.ravel(np.asarray(out[3]))[0])
        times.append(time.time() - t0)
    nfe = int(np.ravel(np.asarray(out[4]))[0])
    rec = {"case": tag, "train_step_ms": round(min(times) * 1e3, 1),
           "nfe": nfe, "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    cases = [
        # (tag, function, local_tiles, T): 0.25 -> 4 NFE, 0.5 -> 8 NFE
        ("transformer_pallas_4nfe", "transformer", "auto", 0.25),
        ("transformer_pallas_8nfe", "transformer", "auto", 0.5),
        ("transformer_xla_4nfe", "transformer", False, 0.25),
        ("laplacian_tiles_4nfe", "laplacian", "auto", 0.25),
    ]
    if len(sys.argv) > 1 and sys.argv[1] == "quick":
        cases = cases[:1]
    out = []
    for tag, fn, lt, tT in cases:
        out.append(timed(tag, *build(fn, lt, tT)))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
