"""Benchmark: edges/s/chip per ODE step (BASELINE.json metric).

Measures one diffusion RHS evaluation — the solver's hot loop body — at two
scales:

- **ogbn-arxiv scale** (169,343 nodes / ~2.3M directed edges, the
  reference's largest workload, `src/best_params.py:7`): the row-tiled MXU
  strategy (graphax.kernels) for both the SpMM (laplacian) and
  SDDMM→softmax→SpMM (transformer attention) RHS, plus the windowed
  (block-dense) and hub-slab strategies on structured graphs and the
  Pallas fwd+bwd training RHS.
- **Cora scale** (`src/best_params.py:1`): the dense-operator strategy.

``vs_baseline`` compares against the same RHS computed with plain XLA
segment ops (gather + scatter-add) — the straightforward port of the
reference's torch_scatter kernels — on the same device/dtype/graph.

Timing: K dependent RHS applications chained inside one jit (`lax.scan`),
so tunnel/dispatch latency amortizes and nothing is constant-folded.
Completion is forced by fetching a scalar reduction of the final state to
the host — on the tunneled device platform `jax.block_until_ready` returns
before the computation has run, so only a host transfer is a real sync.
The measured round-trip latency of an empty jit call is subtracted.

**Timeout-proof protocol** (round-3, output split in round-4): stdout
carries ONLY compact headline JSON lines
(metric/value/unit/vs_baseline/partial — the last line is always the
freshest), so the driver's tail capture can never truncate the head of an
over-long line (the r3 failure mode: ``BENCH_r03.json parsed: null``).
The full cumulative detail snapshot is rewritten to ``bench_local.json``
next to this file after every section. Each section checks the remaining
wall-clock budget (``BENCH_BUDGET_S``, default 540 s) and records
``{"skipped": "budget"}`` instead of starting something it cannot finish;
a daemon watchdog force-emits and exits 0 shortly before the budget
expires, so a hung tunnel compile can never yield an empty artifact.
"""

import dataclasses
import json
import os
import sys
import threading
import time

import numpy as np

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))
RESULTS = {"metric": "attention_rhs_edges_per_s_per_chip", "value": None,
           "unit": "edges/s", "vs_baseline": None, "partial": True}
_EMIT_LOCK = threading.Lock()


def _note(msg):
    print(f"[bench {time.strftime('%H:%M:%S')} +{time.time()-T0:5.1f}s] "
          f"{msg}", file=sys.stderr, flush=True)


_DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_local.json")


def emit():
    """Persist the full cumulative snapshot to bench_local.json and print a
    COMPACT headline JSON line to stdout (last line wins; short enough that
    the driver's tail capture can never truncate it)."""
    with _EMIT_LOCK:
        try:
            tmp = _DETAIL_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(RESULTS, f, indent=1)
            os.replace(tmp, _DETAIL_PATH)
        except Exception as e:  # detail file is best-effort
            _note(f"bench_local.json write failed: {e}")
        head = {
            "metric": RESULTS.get("metric"),
            "value": RESULTS.get("value"),
            "unit": RESULTS.get("unit"),
            "vs_baseline": RESULTS.get("vs_baseline"),
            "partial": RESULTS.get("partial", True),
        }
        if RESULTS.get("watchdog_fired"):
            head["watchdog_fired"] = True
        # second headline: the structured-graph (community-ordered,
        # windowed) attention RHS — the shipped strategy for real benchmark
        # graphs (printed BEFORE the tiled line; the last line stays the
        # tiled headline for cross-round continuity). Carries the
        # in_window_frac caveat: the win depends on community structure.
        win = RESULTS.get("arxiv_scale_clustered_windowed")
        if isinstance(win, dict) and win.get("attention_edges_per_s"):
            ratio = win.get("attention_windowed_vs_tiled") or 1.0
            vsb = RESULTS.get("vs_baseline")
            print(json.dumps({
                "metric": "attention_rhs_edges_per_s_per_chip_windowed",
                "value": win["attention_edges_per_s"],
                "unit": "edges/s",
                "vs_baseline": (round(vsb * ratio, 2)
                                if vsb is not None else None),
                "partial": RESULTS.get("partial", True),
                "in_window_frac": win.get("in_window_frac"),
            }), flush=True)
        print(json.dumps(head), flush=True)


def time_left() -> float:
    return BUDGET_S - (time.time() - T0)


def _watchdog():
    """Force-emit and exit 0 before the driver's timeout can hit us.
    The main thread may be mutating RESULTS concurrently — fall back to a
    headline-only line rather than dying on a serialization race."""
    RESULTS["watchdog_fired"] = True
    try:
        emit()
    except Exception:
        try:
            print(json.dumps({
                "metric": RESULTS.get("metric"),
                "value": RESULTS.get("value"),
                "unit": RESULTS.get("unit"),
                "vs_baseline": RESULTS.get("vs_baseline"),
                "partial": True, "watchdog_fired": True,
            }), flush=True)
        except Exception:
            pass
    os._exit(0)


def run_section(name, fn, min_seconds):
    """Run one bench section; budget-gate, catch, and always emit after."""
    if time_left() < min_seconds:
        RESULTS[name] = {"skipped": "budget"}
        _note(f"SKIP {name}: {time_left():.0f}s left < {min_seconds}s")
    else:
        _note(f"section {name} (budget left {time_left():.0f}s)")
        try:
            fn()
        except Exception as e:  # a failed section must not kill the rest
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            _note(f"section {name} FAILED: {e}")
    emit()


_RTT = None  # host<->device round-trip of a tiny jit call + scalar fetch


def _round_trip() -> float:
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        tiny = jax.jit(lambda v: v * 2.0)
        x = jnp.ones(())
        float(tiny(x))
        _RTT = min(_time_fetch(tiny, x) for _ in range(5))
    return _RTT


def _time_fetch(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def bench_chained(fn, state, *args, iters=10, warmup=1):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(s, *a):
        out = jax.lax.scan(lambda c, _: (fn(c, *a), None), s, None,
                           length=iters)[0]
        # scalar output: the host fetch that forces execution moves 4 bytes
        return jnp.sum(out.astype(jnp.float32))

    rtt = _round_trip()
    for _ in range(warmup):
        float(run(state, *args))
    t = min(_time_fetch(run, state, *args) for _ in range(3))
    return max(t - rtt, 1e-9) / iters


def measure_peaks(dtype):
    """Empirical single-chip peaks — the roofline denominators.

    HBM: stream-copy bandwidth of a 256MB elementwise op (read+write).
    MXU: sustained matmul rate at a large square size. Measured, not quoted
    from a spec sheet, so the roofline %s hold on whatever chip the driver
    runs (v5e/v6e/...)."""
    import jax
    import jax.numpy as jnp

    m = 4096
    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB

    @jax.jit
    def stream(v):
        out = jax.lax.scan(lambda c, _: (c * 1.0001 + 1.0, None), v, None,
                           length=8)[0]
        return jnp.sum(out[::1024])

    a = jnp.ones((m, m), dtype)

    @jax.jit
    def mm(v):
        out = jax.lax.scan(lambda c, _: ((c @ a) * 1e-3, None), v, None,
                           length=8)[0]
        return jnp.sum(out.astype(jnp.float32)[::64, ::64])

    # random row gather: the third peak that actually binds sparse-graph
    # kernels — per-row granule fetches, width-independent useful bandwidth
    ng, mg, dg = 169_343, 2_000_000, 162
    idx = jnp.asarray(np.random.RandomState(0).randint(0, ng, mg))
    src = jnp.ones((ng, dg), dtype)

    @jax.jit
    def gath(s):
        def body(c, _):
            out = c[idx]                                   # [M, D] gather
            return c * 0.999 + out[:ng] * 1e-6, None
        return jnp.sum(jax.lax.scan(body, s, None, length=4)[0][::512, ::64])

    # narrow random gather: at few-lane widths the gather is ISSUE-RATE
    # bound, not bytes-bound — the floor for the backward's node-table
    # gathers (ns per gathered slot, width-independent below ~32 lanes)
    srcn = jnp.ones((ng, 8), jnp.float32)

    @jax.jit
    def gathn(s):
        def body(c, _):
            out = c[idx]
            return c * 0.999 + out[:ng] * 1e-6, None
        return jnp.sum(jax.lax.scan(body, s, None, length=4)[0][::512, :])

    rtt = _round_trip()
    float(stream(big)); float(mm(a)); float(gath(src)); float(gathn(srcn))
    t_bw = (min(_time_fetch(stream, big) for _ in range(3)) - rtt) / 8
    t_mm = (min(_time_fetch(mm, a) for _ in range(3)) - rtt) / 8
    t_ga = (min(_time_fetch(gath, src) for _ in range(3)) - rtt) / 4
    t_gn = (min(_time_fetch(gathn, srcn) for _ in range(3)) - rtt) / 4
    hbm_gbps = 2 * big.size * 4 / max(t_bw, 1e-9) / 1e9
    mxu_tflops = 2 * m ** 3 / max(t_mm, 1e-9) / 1e12
    gather_gbps = mg * dg * jnp.dtype(dtype).itemsize / max(t_ga, 1e-9) / 1e9
    gather_ns_per_slot = max(t_gn, 1e-9) / mg * 1e9
    return hbm_gbps, mxu_tflops, gather_gbps, gather_ns_per_slot


def roofline(t_s, bytes_moved, flops, hbm_gbps, mxu_tflops,
             gather_bytes=0, gather_gbps=None):
    """Achieved fraction of the measured memory/compute/gather peaks + the
    bound-implied floor time. ``gather_bytes`` are randomly-indexed row
    fetches, charged at the MEASURED granule-bound gather rate (not the
    streaming rate) — that is the realistic bound for sparse-graph kernels,
    and the serial component it forms is added to the streaming term."""
    t_mem = bytes_moved / (hbm_gbps * 1e9)
    t_gather = (gather_bytes / (gather_gbps * 1e9)) if gather_bytes else 0.0
    t_mxu = flops / (mxu_tflops * 1e12)
    floor = max(t_mem + t_gather, t_mxu)
    out = {
        "bytes_mb": round(bytes_moved / 1e6, 1),
        "gflops": round(flops / 1e9, 2),
        "pct_of_hbm_peak": round(100 * t_mem / t_s, 1),
        "pct_of_mxu_peak": round(100 * t_mxu / t_s, 1),
        "floor_ms": round(floor * 1e3, 3),
        "headroom_x": round(t_s / max(floor, 1e-12), 1),
    }
    if gather_bytes:
        out["gather_mb"] = round(gather_bytes / 1e6, 1)
        out["gather_bound_ms"] = round(t_gather * 1e3, 3)
    return out


def build_sorted_edges(n, avg_deg, seed=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, n * avg_deg)
    col = rng.randint(0, n, n * avg_deg)
    keep = row != col
    row, col = row[keep], col[keep]
    order = np.lexsort((col, row))
    return row[order], col[order]


def main():
    # watchdog fires before the budget (15s early, or at 90% of a small
    # budget) so the final emit always lands ahead of any external timeout
    wd = threading.Timer(max(min(BUDGET_S - 15.0, BUDGET_S * 0.9), 5.0),
                         _watchdog)
    wd.daemon = True
    wd.start()
    emit()  # a parseable (empty-value) line exists from second zero

    _note("importing jax / claiming device (tunnel claim can take ~60s "
          "if another client just released it)")
    import jax
    import jax.numpy as jnp

    from graphax import Config
    from graphax.functions import get_function
    from graphax.functions.common import FuncState, prepare_scalars
    from graphax.kernels.dispatch import attach_tiles
    from graphax.sparse import Graph

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    rng = np.random.RandomState(1)
    RESULTS["platform"] = platform
    RESULTS["dtype"] = str(dtype.__name__)
    _note(f"device claimed: platform={platform}")
    emit()

    # ---- shared arxiv-scale inputs --------------------------------------
    n, avg_deg, d = 169_343, 14, 162
    row, col = build_sorted_edges(n, avg_deg)
    e = len(row)
    g0 = Graph.from_edges(row, col, n)
    g_tiled = dataclasses.replace(attach_tiles(g0), strategy="tiled")
    g_xla = dataclasses.replace(g0, strategy="edge")
    x = jnp.asarray(rng.randn(n, d), dtype)

    cfg_att = Config(function="transformer", heads=2, attention_dim=32,
                     hidden_dim=d, attention_type="scaled_dot",
                     self_loop_weight=1.0)
    cfg_lap = Config(function="laplacian", hidden_dim=d, self_loop_weight=1.0)
    f_att = get_function(cfg_att, d)
    f_lap = get_function(cfg_lap, d)
    # the solver path (blocks.integrate) prepares activation scalars once
    # per forward; mirror that here
    p_att = prepare_scalars(f_att.init(jax.random.PRNGKey(0)), cfg_att, dtype)
    p_lap = prepare_scalars(f_lap.init(jax.random.PRNGKey(0)), cfg_lap, dtype)

    def rhs_step(func):
        def step(s, fs, p):
            return s * 0.99 + func.rhs(p, fs, 0.0, s).astype(s.dtype) * 0.01
        return step

    # the real dispatch path: make_fstate pre-blocks edge values for the
    # Pallas SpMM custom_vjp and flags the eval-only fused attention kernels
    from graphax.blocks.common import make_fstate

    fs_tiled = make_fstate(g_tiled, x, train=False)
    fs_xla = FuncState(graph=g_xla, x0=x)

    # ---- section 1: arxiv tiled (THE headline) --------------------------
    def sec_tiled():
        _note("tiled: attention rhs (headline)")
        t_att = bench_chained(rhs_step(f_att), x, fs_tiled, p_att)
        RESULTS["value"] = round(e / t_att, 1)
        RESULTS["arxiv_scale"] = {
            "n_nodes": n, "n_edges": e,
            "attention_rhs_ms": round(t_att * 1e3, 2),
        }
        emit()  # headline metric is on stdout from here on
        _note("tiled: attention xla baseline")
        t_att_base = bench_chained(rhs_step(f_att), x, fs_xla, p_att)
        RESULTS["vs_baseline"] = round(t_att_base / t_att, 2)
        RESULTS["arxiv_scale"]["attention_rhs_ms_xla_baseline"] = \
            round(t_att_base * 1e3, 2)
        emit()
        _note("tiled: spmm rhs")
        t_lap = bench_chained(rhs_step(f_lap), x, fs_tiled, p_lap)
        RESULTS["arxiv_scale"].update({
            "spmm_rhs_ms": round(t_lap * 1e3, 2),
            "spmm_edges_per_s": round(e / t_lap, 1),
        })
        emit()
        _note("tiled: spmm xla baseline")
        t_lap_base = bench_chained(rhs_step(f_lap), x, fs_xla, p_lap)
        RESULTS["arxiv_scale"].update({
            "spmm_rhs_ms_xla_baseline": round(t_lap_base * 1e3, 2),
            "spmm_vs_baseline": round(t_lap_base / t_lap, 2),
        })

    run_section("arxiv_scale", sec_tiled, min_seconds=30)

    # ---- section 2: community-structured windowed strategy --------------
    # Real benchmark graphs have community structure; after community_order
    # reordering the windowed strategy replaces the granule-bound random
    # gather with precomputed block-dense operators: in-window edges become
    # one batched MXU matmul per RHS evaluation (graphax.kernels.windows).
    win_state = {}

    def sec_windowed():
        from graphax.kernels.dispatch import attach_windows
        from graphax.kernels.windows import community_order

        window = 512
        comm = rng.randint(0, n // window + 1, n)  # shuffled community ids
        src = rng.randint(0, n, n * avg_deg)
        same = rng.rand(n * avg_deg) < 0.75
        dst = rng.randint(0, n, n * avg_deg)
        order_c = np.argsort(comm, kind="stable")
        # map each same-community edge to a random member of src's community
        starts = np.searchsorted(comm[order_c], np.arange(comm.max() + 1))
        ends = np.searchsorted(comm[order_c], np.arange(comm.max() + 1),
                               "right")
        cs, ce = starts[comm[src]], ends[comm[src]]
        dst_in = order_c[cs + (rng.rand(n * avg_deg)
                               * (ce - cs)).astype(np.int64)]
        dst = np.where(same, dst_in, dst)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        perm = community_order(src, dst, n, window=window)
        rs, cs2 = perm[src], perm[dst]
        order2 = np.lexsort((cs2, rs))
        rs, cs2 = rs[order2], cs2[order2]
        ew = len(rs)
        gw0 = Graph.from_edges(rs, cs2, n)
        g_win = attach_windows(gw0, window=window)
        g_win_tiled = dataclasses.replace(attach_tiles(gw0),
                                          strategy="tiled")
        in_frac = g_win.windows.in_window_edges / ew
        fs_win = make_fstate(g_win, x, train=False)
        fs_win_tiled = make_fstate(g_win_tiled, x, train=False)
        _note("windowed: spmm")
        t_win = bench_chained(rhs_step(f_lap), x, fs_win, p_lap)
        RESULTS["arxiv_scale_clustered_windowed"] = {
            "n_nodes": n, "n_edges": ew,
            "in_window_frac": round(in_frac, 3),
            "spmm_rhs_ms": round(t_win * 1e3, 2),
            "spmm_edges_per_s": round(ew / t_win, 1),
        }
        emit()
        _note("windowed: spmm tiled comparison")
        t_win_tiled = bench_chained(rhs_step(f_lap), x, fs_win_tiled, p_lap)
        RESULTS["arxiv_scale_clustered_windowed"].update({
            "spmm_rhs_ms_tiled": round(t_win_tiled * 1e3, 2),
            "windowed_vs_tiled": round(t_win_tiled / t_win, 2),
        })
        emit()
        # per-NFE attention recompute (GRAND-nl) through the block-dense
        # windowed scores + aggregation (kernels.windowed_attention)
        _note("windowed: attention")
        t_att_win = bench_chained(rhs_step(f_att), x, fs_win, p_att)
        t_att_win_tiled = bench_chained(rhs_step(f_att), x, fs_win_tiled,
                                        p_att)
        RESULTS["arxiv_scale_clustered_windowed"].update({
            "attention_rhs_ms": round(t_att_win * 1e3, 2),
            "attention_rhs_ms_tiled": round(t_att_win_tiled * 1e3, 2),
            "attention_edges_per_s": round(ew / t_att_win, 1),
            "attention_windowed_vs_tiled": round(t_att_win_tiled
                                                 / t_att_win, 2),
        })
        emit()

        # once-per-forward densify cost (amortized over the solve's NFEs)
        from graphax.kernels.pallas_windows import densify_windows
        from graphax.kernels.windows import blocked_window_values

        @jax.jit
        def _densify(values):
            win, _, _ = blocked_window_values(values, g_win.windows)
            return jnp.sum(densify_windows(win.astype(dtype), g_win.windows)
                           .astype(jnp.float32))

        rtt = _round_trip()
        float(_densify(g_win.edge_weight))
        t_densify = max(min(_time_fetch(_densify, g_win.edge_weight)
                            for _ in range(3)) - rtt, 1e-9)
        RESULTS["arxiv_scale_clustered_windowed"]["densify_once_ms"] = \
            round(t_densify * 1e3, 2)
        win_state.update(g_win=g_win, t_win=t_win, ew=ew)

    run_section("arxiv_scale_clustered_windowed", sec_windowed,
                min_seconds=60)

    # ---- section 3: training step, Pallas vs XLA fwd+bwd ----------------
    # (round-2 deliverable: the per-NFE TRAINING attention rides Pallas end
    # to end — kernels.pallas_attention backward kernels)
    def sec_train():
        def grad_step(func, p):
            def step(s, fs):
                def loss(xx, qw):
                    pp = {**p, "att": {**p["att"],
                                       "Q": {**p["att"]["Q"], "w": qw}}}
                    return jnp.sum(func.rhs(pp, fs, 0.0, xx)
                                   .astype(jnp.float32))

                gx, gq = jax.grad(loss, argnums=(0, 1))(s,
                                                        p["att"]["Q"]["w"])
                # fold a param-grad scalar in so no cotangent is DCE'd
                return (s * 0.99 + 0.01 * gx.astype(s.dtype)
                        + (jnp.sum(gq) * 1e-12).astype(s.dtype))
            return step

        fs_train_pl = make_fstate(g_tiled, x, train=True, cfg=cfg_att)
        fs_train_xla = make_fstate(g_tiled, x, train=True)
        _note("train-step: pallas")
        t_train_pl = bench_chained(grad_step(f_att, p_att), x, fs_train_pl,
                                   iters=6)
        RESULTS["train_step"] = {
            "n_edges": e,
            "train_rhs_fwdbwd_ms_pallas": round(t_train_pl * 1e3, 2),
        }
        emit()
        _note("train-step: xla")
        t_train_xla = bench_chained(grad_step(f_att, p_att), x,
                                    fs_train_xla, iters=6)
        RESULTS["train_step"].update({
            "train_rhs_fwdbwd_ms_xla": round(t_train_xla * 1e3, 2),
            "pallas_vs_xla": round(t_train_xla / t_train_pl, 2),
        })

    run_section("train_step", sec_train, min_seconds=75)

    # ---- section 4: power-law hub-slab strategy -------------------------
    # Citation graphs are community-structured AND heavy-tailed; the hub
    # layout (kernels.hubs) serves the top-in-degree columns from dense
    # operator blocks against a tiny x[hub_ids] slab — one shared-rhs MXU
    # matmul replacing the granule-bound gathers those edges would pay.
    hub_state = {}

    def sec_hub():
        from graphax.kernels.hubs import attach_hubs

        n_hubs = 512
        hub_ids0 = rng.choice(n, n_hubs, replace=False)
        src_h = rng.randint(0, n, n * avg_deg)
        # 55% of edges hit hubs: the gather cost is per padded SLOT of the
        # tiled layout (block-size quantized), so hub extraction only pays
        # once coverage sheds whole block quanta per tile — the slot-aware
        # gate (kernels.hubs) declines below ~40% at this degree profile
        # and this section exercises the engaged regime
        to_hub = rng.rand(n * avg_deg) < 0.55
        dst_h = np.where(to_hub,
                         hub_ids0[rng.randint(0, n_hubs, n * avg_deg)],
                         rng.randint(0, n, n * avg_deg))
        keep_h = src_h != dst_h
        src_h, dst_h = src_h[keep_h], dst_h[keep_h]
        oh_ = np.lexsort((dst_h, src_h))
        gh0 = Graph.from_edges(src_h[oh_], dst_h[oh_], n)
        eh = len(src_h)
        g_hub = dataclasses.replace(attach_hubs(attach_tiles(gh0)),
                                    strategy="tiled")
        g_hub_plain = dataclasses.replace(attach_tiles(gh0),
                                          strategy="tiled")
        hub_cov = (g_hub.hubs.hub_edges / eh) if g_hub.hubs is not None \
            else 0.0
        fs_hub = make_fstate(g_hub, x, train=False)
        fs_hub_plain = make_fstate(g_hub_plain, x, train=False)
        _note("hub: spmm")
        t_hub = bench_chained(rhs_step(f_lap), x, fs_hub, p_lap)
        RESULTS["arxiv_scale_powerlaw_hub"] = {
            "n_nodes": n, "n_edges": eh,
            "hub_size": (g_hub.hubs.hub_size if g_hub.hubs is not None
                         else 0),
            "hub_edge_frac": round(hub_cov, 3),
            "spmm_rhs_ms": round(t_hub * 1e3, 2),
            "spmm_edges_per_s": round(eh / t_hub, 1),
        }
        emit()
        _note("hub: plain-tiled comparison")
        t_hub_plain = bench_chained(rhs_step(f_lap), x, fs_hub_plain, p_lap)
        RESULTS["arxiv_scale_powerlaw_hub"].update({
            "spmm_rhs_ms_no_hubs": round(t_hub_plain * 1e3, 2),
            "hub_vs_plain": round(t_hub_plain / t_hub, 2),
        })
        hub_state.update(g_hub=g_hub, t_hub=t_hub, eh=eh)

    run_section("arxiv_scale_powerlaw_hub", sec_hub, min_seconds=45)


    # ---- section 5: measured chip peaks + rooflines ---------------------
    def sec_roofline():
        hbm_gbps, mxu_tflops, gather_gbps, gather_ns = measure_peaks(dtype)
        bpe = jnp.dtype(dtype).itemsize
        roof = {
            "hbm_gbps_measured": round(hbm_gbps, 1),
            "mxu_tflops_measured": round(mxu_tflops, 1),
            "gather_gbps_measured": round(gather_gbps, 1),
            "gather_ns_per_slot_measured": round(gather_ns, 2),
        }

        # `floor_ms` in the roofline dicts is the idealized bound (real
        # edges, no padding, no buffer round trip). `explained` itemizes
        # where the measured time ACTUALLY goes (r2 VERDICT item 8): the
        # gather is slot-bound at the measured rate over the tiled layout's
        # full CAPACITY (padded slots gather too), the gathered [B, Eb, D]
        # buffer makes one HBM write+read round trip between the XLA gather
        # and the Pallas reduction, and each block carries a ~0.4 us fixed
        # cost (kernels.tiles.choose_block_edges, 90-slot equivalents).
        BLOCK_US = 0.4e-6

        def explain(t_s, cap_slots, n_blocks, extra_stream_bytes,
                    mxu_flops):
            g = cap_slots * d * bpe / (gather_gbps * 1e9)
            rt = 2 * cap_slots * d * bpe / (hbm_gbps * 1e9)
            st = extra_stream_bytes / (hbm_gbps * 1e9)
            bo = n_blocks * BLOCK_US
            mx = mxu_flops / (mxu_tflops * 1e12)
            total = g + rt + st + bo + mx
            return {
                "gather_capacity_ms": round(g * 1e3, 3),
                "buffer_roundtrip_ms": round(rt * 1e3, 3),
                "stream_ms": round(st * 1e3, 3),
                "block_overhead_ms": round(bo * 1e3, 3),
                "mxu_ms": round(mx * 1e3, 3),
                "explained_ms": round(total * 1e3, 3),
                "measured_vs_explained_x": round(t_s / max(total, 1e-12),
                                                 2),
            }
        arx = RESULTS.get("arxiv_scale", {})
        # tiled SpMM per NFE: E·D random row gather (granule-bound, charged
        # at the measured gather rate) + the gathered buffer's write+read
        # stream, weights E·4, out N·D f32
        gbytes_tiled = e * d * bpe
        bytes_tiled = 2 * e * d * bpe + e * 4 + 2 * n * d * 4
        flops_tiled = 2 * e * d
        if "spmm_rhs_ms" in arx:
            roof["spmm_tiled"] = roofline(
                arx["spmm_rhs_ms"] / 1e3, bytes_tiled, flops_tiled,
                hbm_gbps, mxu_tflops, gbytes_tiled, gather_gbps)
            tl = g_tiled.tiles
            cap_t = tl.edge_slot.shape[0] * tl.edge_slot.shape[1]
            roof["spmm_tiled"]["explained"] = explain(
                arx["spmm_rhs_ms"] / 1e3, cap_t, tl.edge_slot.shape[0],
                e * 4 + 2 * n * d * 4, 2 * cap_t * d)
        if "attention_rhs_ms" in arx:
            # attention RHS (tiled): + K projection on gathered sources
            # (E·A·D FLOPs), scores/normalize E·H traffic
            a_dim = cfg_att.attention_dim
            bytes_att = (bytes_tiled + 3 * e * cfg_att.heads * 4
                         + n * a_dim * bpe)
            flops_att = flops_tiled + 2 * e * a_dim * d + 2 * e * a_dim
            roof["attention_tiled"] = roofline(
                arx["attention_rhs_ms"] / 1e3, bytes_att, flops_att,
                hbm_gbps, mxu_tflops, gbytes_tiled, gather_gbps)
        ts_r = RESULTS.get("train_step", {})
        if "train_rhs_fwdbwd_ms_pallas" in ts_r and \
                "attention_rhs_ms" in arx:
            # BACKWARD roofline (r4 VERDICT item 2): itemized floor for the
            # B1/B2/B3 Pallas backward. Three mandatory gathers — the xg
            # row re-gather (CSE'd with the remat forward's), the cotangent
            # col gather, and the packed q̃+shift+denom+ρ node-table gather
            # — each charged at max(bytes/gather_rate, slots·issue_ns);
            # everything else streams at HBM rate; one-hot tile dots and
            # the dense param-grad matmuls on the MXU.
            t_bwd = (ts_r["train_rhs_fwdbwd_ms_pallas"]
                     - arx["attention_rhs_ms"]) / 1e3
            tl = g_tiled.tiles
            tlt = g_tiled.tiles_t
            cap_r = tl.edge_slot.shape[0] * tl.edge_slot.shape[1]
            cap_t = tlt.edge_slot.shape[0] * tlt.edge_slot.shape[1]
            H, A = cfg_att.heads, cfg_att.attention_dim
            tile_r, tile_tt = tl.tile, tlt.tile

            def g_s(slots, nbytes):
                return max(nbytes / (gather_gbps * 1e9),
                           slots * gather_ns * 1e-9)

            g_xg = g_s(cap_r, cap_r * d * bpe)
            g_gg = g_s(cap_t, cap_t * d * bpe)
            # B3's q̃ + shift/denom/ρ node-table gathers, charged at the
            # PERFECT-OVERLAP optimum (total bytes + one issue floor) —
            # they are kept separate because packing serializes the
            # latency they otherwise hide (measured negative, r3 + r5)
            g_pk = g_s(cap_t, cap_t * (A * bpe + 3 * H * 4))
            stream_bytes = (
                cap_r * H * 4                    # scores (saved residual)
                + 4 * cap_r * H * 4              # ah/da/rho round trips
                + cap_r * d * bpe                # B2 xg re-read
                + n * A * 4                      # dq out
                + 2 * cap_t * (A + 3 * H) * 4    # packed-table round trip
                + cap_t * d * bpe                # gg re-read in B3
                + 2 * n * (A + d) * bpe          # k/x transpose tiles
                + n * (A + d) * 4                # dk + dx_val out
                + 2 * n * d * 4)                 # dense matmul operands
            mxu_flops = (
                2 * cap_r * (tile_r * (d + A + 3 * H) + A * d)
                + 2 * cap_t * tile_tt * (2 * A + d)
                + 6 * n * d * A)                 # k proj + dqw/dkw + dx
            st = stream_bytes / (hbm_gbps * 1e9)
            n_blocks_bwd = 2 * tl.edge_slot.shape[0] + tlt.edge_slot.shape[0]
            bo = n_blocks_bwd * BLOCK_US
            mx = mxu_flops / (mxu_tflops * 1e12)
            total = g_xg + g_gg + g_pk + st + bo + mx
            roof["attention_bwd"] = {
                "measured_ms": round(t_bwd * 1e3, 3),
                "floor_ms": round(total * 1e3, 3),
                "headroom_x": round(t_bwd / max(total, 1e-12), 2),
                "explained": {
                    "gather_xg_ms": round(g_xg * 1e3, 3),
                    "gather_cotangent_ms": round(g_gg * 1e3, 3),
                    "gather_node_tables_ms": round(g_pk * 1e3, 3),
                    "stream_ms": round(st * 1e3, 3),
                    "block_overhead_ms": round(bo * 1e3, 3),
                    "mxu_ms": round(mx * 1e3, 3),
                    "explained_ms": round(total * 1e3, 3),
                },
            }
        if win_state:
            # windowed per NFE: dense blocks T·tile·W, slab reads ≤ T·W·D,
            # out N·D f32 + residual gather (granule-bound part split out)
            wt = win_state["g_win"].windows
            t_tiles, tile_r, win_w = wt.num_tiles, wt.tile, wt.window
            res_e = int(np.asarray(wt.residual.slot_mask).sum())
            gbytes_win = res_e * d * bpe
            bytes_win = (t_tiles * tile_r * win_w * bpe
                         + t_tiles * win_w * d * bpe
                         + 2 * n * d * 4 + res_e * d * bpe + res_e * 4)
            flops_win = 2 * t_tiles * tile_r * win_w * d + 2 * res_e * d
            roof["spmm_windowed"] = roofline(
                win_state["t_win"], bytes_win, flops_win, hbm_gbps,
                mxu_tflops, gbytes_win, gather_gbps)
            rl = wt.residual
            cap_r = rl.edge_slot.shape[0] * rl.edge_slot.shape[1]
            # win part: dense blocks + slab + win out + final combine
            win_stream = (t_tiles * tile_r * win_w * bpe
                          + wt.num_windows * win_w * d * bpe
                          + t_tiles * tile_r * d * 4     # win out write
                          + 3 * n * d * 4)               # add: 2 reads+write
            roof["spmm_windowed"]["explained"] = explain(
                win_state["t_win"], cap_r, rl.edge_slot.shape[0],
                win_stream, 2 * t_tiles * tile_r * win_w * d
                + 2 * cap_r * d)
        if hub_state and hub_state["g_hub"].hubs is not None:
            # hub-layout SpMM: dense hub blocks T·tile·H + rest gather
            g_hub, eh = hub_state["g_hub"], hub_state["eh"]
            hub_e = g_hub.hubs.hub_edges
            hub_h = g_hub.hubs.hub_size
            h_tiles, h_tile = g_hub.hubs.num_tiles, g_hub.hubs.tile
            gbytes_hub = (eh - hub_e) * d * bpe
            bytes_hub = (h_tiles * h_tile * hub_h * bpe
                         + (eh - hub_e) * d * bpe + 2 * n * d * 4
                         + (eh - hub_e) * 4)
            flops_hub = (2 * h_tiles * h_tile * hub_h * d
                         + 2 * (eh - hub_e) * d)
            roof["spmm_hub"] = roofline(
                hub_state["t_hub"], bytes_hub, flops_hub, hbm_gbps,
                mxu_tflops, gbytes_hub, gather_gbps)
            rest = g_hub.hubs.rest
            cap_rest = rest.edge_slot.shape[0] * rest.edge_slot.shape[1]
            hub_stream = (h_tiles * h_tile * hub_h * bpe
                          + hub_h * d * bpe
                          + h_tiles * h_tile * d * 4 + 3 * n * d * 4)
            roof["spmm_hub"]["explained"] = explain(
                hub_state["t_hub"], cap_rest, rest.edge_slot.shape[0],
                hub_stream, 2 * h_tiles * h_tile * hub_h * d
                + 2 * cap_rest * d)
        RESULTS["roofline"] = roof

    run_section("roofline", sec_roofline, min_seconds=30)

    # ---- section 6: Cora scale (dense strategy) -------------------------
    def sec_cora():
        from graphax.kernels.dense_path import densify

        nc, dc = 2485, 80
        rc, cc = build_sorted_edges(nc, 4, seed=2)
        gc0 = Graph.from_edges(rc, cc, nc)
        ec = len(rc)
        gc_dense = dataclasses.replace(gc0, strategy="dense")
        gc_xla = dataclasses.replace(gc0, strategy="edge")
        xc = jnp.asarray(rng.randn(nc, dc), jnp.float32)
        cfg_c = Config(function="laplacian", hidden_dim=dc,
                       self_loop_weight=1.0)
        f_c = get_function(cfg_c, dc)
        p_c = prepare_scalars(f_c.init(jax.random.PRNGKey(0)), cfg_c,
                              jnp.float32)
        fs_cd = FuncState(graph=gc_dense, x0=xc,
                          dense_adj=densify(gc_dense, gc_dense.edge_weight))
        fs_ce = FuncState(graph=gc_xla, x0=xc)
        t_cora = bench_chained(rhs_step(f_c), xc, fs_cd, p_c, iters=400)
        t_cora_base = bench_chained(rhs_step(f_c), xc, fs_ce, p_c,
                                    iters=400)
        RESULTS["cora_scale_dense"] = {
            "n_nodes": nc, "n_edges": ec,
            "spmm_rhs_ms": round(t_cora * 1e3, 3),
            "spmm_rhs_ms_xla_baseline": round(t_cora_base * 1e3, 3),
            "spmm_vs_baseline": round(t_cora_base / t_cora, 2),
        }

    run_section("cora_scale_dense", sec_cora, min_seconds=30)

    RESULTS["partial"] = False
    RESULTS["elapsed_s"] = round(time.time() - T0, 1)
    emit()


if __name__ == "__main__":
    main()
