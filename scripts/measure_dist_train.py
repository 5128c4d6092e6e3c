"""Measure the PRODUCTION sharded train step at ogbn-arxiv scale on the
real chip (1-shard mesh — the per-shard compute floor; halo cost is
ICI-bound and modeled in SCALING.md).

This is the committed form of the r3 ad-hoc measurement behind SCALING.md's
"Sharded transformer at arxiv scale" section (14.3 s/step with the XLA
per-edge attention). It builds `make_sharded_gnn` over a 1-device mesh on
the TPU, runs full train steps (fwd + bwd + optimizer) and the eval
forward, and reports wall times — so the round-4 streaming-Pallas sharded
attention (graphax.kernels.pallas_attention two-input form inside
dist/model._rhs) is measured with the same methodology as its baseline.

Usage (on the TPU):  python scripts/measure_dist_train.py [function]
  function: transformer (default) | laplacian | both
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def measure(function: str, n=169_343, d=162, avg_deg=14, steps=2,
            local_tiles="auto", kind="sbm"):
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
        # MXU-aligned head width (d_k = 40). The r3 harness picked 164
        # (d_k = 41) — numerically fine, but the extra unaligned padding
        # pushed the 16-NFE train step over the HBM ceiling and XLA's
        # silent spill-compression made it 113 s instead of 1.9 s
        # (SCALING.md r4 section; Config.stage_remat is the designed
        # escape hatch for configs that genuinely exceed HBM).
        attention_dim=(d // 4) * 4,
        attention_type="scaled_dot", method="rk4", step_size=0.25,
        time=1.0, add_source=True, self_loop_weight=1.0,
        input_dropout=0.0, dropout=0.0, lr=0.005, no_early=True,
        dtype="bfloat16")

    row, col = build_graph(kind, n, avg_deg)
    g = Graph.from_edges(row, col, n)
    num_classes = 40
    rng = np.random.RandomState(0)

    mesh = make_mesh((1,), ("graph",))
    part = normalized_partition(cfg, g, 1)
    t0 = time.time()
    sharded = make_sharded_gnn(mesh, part, cfg, d, num_classes,
                               local_tiles=local_tiles)
    build_s = time.time() - t0

    x = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, num_classes, n)
    mask = rng.rand(n) < 0.5
    xs = jnp.asarray(shard_nodes(x, part))
    ys = jnp.asarray(shard_nodes(y[:, None], part))[..., 0] \
        .astype(jnp.int32)
    ms = jnp.asarray(shard_nodes(mask[:, None].astype(np.float32),
                                 part))[..., 0] > 0.5

    params, state = sharded.init(jax.random.PRNGKey(0))
    from graphax.train.optimizers import get_optimizer

    opt_state = get_optimizer(cfg.optimizer, cfg.lr, cfg.decay).init(params)

    def run_step(params, state, opt_state):
        return sharded.train_step(params, state, opt_state, xs, ys, ms,
                                  jax.random.PRNGKey(1))

    # Warmup: the first call compiles for fresh (default-layout) inputs;
    # feeding a step's OUTPUT params back in changes the arrays' concrete
    # device layouts, which re-keys the jit cache — the layout chain
    # reaches its fixed point after two more ~2 min compiles (measured;
    # documented in graphax.dist.model). Chain until a step is fast so the
    # timed loop sees the steady state, and report the warmup separately.
    t0 = time.time()
    params, state, opt_state, loss, nfe = run_step(params, state, opt_state)
    loss_v = float(np.ravel(np.asarray(loss))[0])
    compile_s = time.time() - t0
    warmup_s, warmup_calls = 0.0, 0
    for _ in range(4):
        t0 = time.time()
        params, state, opt_state, loss, nfe = run_step(params, state,
                                                       opt_state)
        loss_v = float(np.ravel(np.asarray(loss))[0])
        dt = time.time() - t0
        warmup_s += dt
        warmup_calls += 1
        if dt < 0.5 * compile_s:
            break
    times = []
    for _ in range(steps):
        t0 = time.time()
        params, state, opt_state, loss, nfe = run_step(params, state,
                                                       opt_state)
        loss_v = float(np.ravel(np.asarray(loss))[0])
        times.append(time.time() - t0)
    train_ms = min(times) * 1e3

    # eval forward. Sync via an on-device scalar sum — fetching the full
    # [P, Nb, C] logits through the axon tunnel costs ~610 ms for 27 MB
    # (measured r5, scripts/ isolate experiment: same forward 355.8 ms with
    # a scalar output vs 964.6 ms with the logits fetch), which silently
    # dominated the r3/r4 "eval-forward" rows.
    sum_logits = jax.jit(lambda l: jnp.sum(l.astype(jnp.float32)))

    def eval_once():
        return float(sum_logits(sharded.forward_logits(params, state, xs)))

    t0 = time.time()
    eval_once()
    eval_compile_s = time.time() - t0
    ev = []
    for _ in range(steps):
        t0 = time.time()
        eval_once()
        ev.append(time.time() - t0)
    eval_ms = min(ev) * 1e3
    nfe_v = int(np.ravel(np.asarray(nfe))[0])
    return {
        "function": function, "local_tiles": str(local_tiles),
        "kind": kind, "n": n, "e": int(g.num_edges), "d": d,
        "train_step_ms": round(train_ms, 1),
        "eval_forward_ms": round(eval_ms, 1),
        "nfe_per_forward": nfe_v,
        "train_ms_per_nfe": round(train_ms / max(nfe_v, 1), 2),
        "loss": round(loss_v, 4),
        "compile_s": round(compile_s, 1),
        "layout_warmup_s": round(warmup_s, 1),
        "layout_warmup_calls": warmup_calls,
        "eval_compile_s": round(eval_compile_s, 1),
        "build_s": round(build_s, 1),
    }


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "transformer"
    if which == "windowed":
        # laplacian per-NFE SpMM as block-dense window matmuls on a
        # community-ordered graph (the windowed strategy's precondition),
        # vs the plain tiled local compute on the SAME graph
        print(json.dumps([
            measure("laplacian", local_tiles="windowed",
                    kind="sbm_ordered"),
            measure("laplacian", local_tiles="auto", kind="sbm_ordered"),
        ], indent=1))
        raise SystemExit(0)
    fns = ("transformer", "laplacian") if which == "both" else (which,)
    out = [measure(f) for f in fns]
    print(json.dumps(out, indent=1))
