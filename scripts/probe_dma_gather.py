"""Probe: can a Pallas in-kernel row gather (per-row async DMA from HBM,
ring-buffered) beat XLA's gather + the HBM round trip of the gathered
buffer? (VERDICT r3 item 4 / bench_local.json roofline
``buffer_roundtrip_ms``.)

Three timings at arxiv-like shapes:
  xla_gather       — ``x[idx]`` alone (the producer the tiled SpMM uses)
  xla_roundtrip    — gather + a consumer kernel re-reading the buffer
                     (what the tiled path pays today)
  pallas_dma       — consumer kernel that DMAs the rows itself from HBM
                     via scalar-prefetched indices (the fused candidate)

The decision recorded in SCALING.md comes from running this ON THE REAL
CHIP: per-row DMAs are issue-rate-bound (one descriptor per ~650 B row),
so the fused kernel must sustain ≳ the gather engine's measured ~105 GB/s
random-row bandwidth to win.
"""

import functools
import json
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    # the machine's sitecustomize pins the axon TPU backend at interpreter
    # startup; runtime config is the only way to force CPU here
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 16   # DMA ring depth


def _interpret():
    return jax.default_backend() != "tpu"


def dma_gather_sum(x, idx, eb: int):
    """For each block b: DMA rows x[idx[b, e]] (e < eb) into VMEM and
    reduce them to one [D] vector — the minimal consumer that forces the
    gather without writing an [B*Eb, D] output."""
    bblocks = idx.shape[0]
    d = x.shape[1]

    def kernel(idx_ref, x_hbm, o_ref):
        b = pl.program_id(0)

        def body(scratch, sems):
            # Mosaic constraint (measured, r4): DMA slices of a tiled
            # [N, D] array must be SUBLANE-ALIGNED — a single-row copy
            # "must be aligned to tiling (8)". The minimal expressible
            # random-row gather therefore copies the aligned 8-row group
            # containing the target row: 8x read amplification before the
            # issue rate is even counted.
            def get_dma(e):
                aligned = (idx_ref[b, e] // 8) * 8
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(aligned, 8)],
                    scratch.at[e % (2 * NBUF)],
                    sems.at[e % NBUF])

            def issue(e, _):
                @pl.when(e >= NBUF)
                def _():
                    get_dma(e - NBUF).wait()
                get_dma(e).start()
                return 0

            jax.lax.fori_loop(0, eb, issue, 0)

            def drain(e, _):
                get_dma(e).wait()
                return 0

            jax.lax.fori_loop(max(eb - NBUF, 0), eb, drain, 0)
            # broadcast the block reduction over an 8-row output block —
            # a single dynamic-row store would need sublane alignment
            o_ref[0] = jnp.broadcast_to(
                jnp.sum(scratch[:].reshape(2 * NBUF * 8, d),
                        axis=0)[None], (8, d))

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2 * NBUF, 8, d), x.dtype),
            sems=pltpu.SemaphoreType.DMA((NBUF,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, d), lambda i, *_: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bblocks, 8, d), x.dtype),
        interpret=_interpret(),
    )(idx, x)


def consume_sum(xg):
    """Consumer that re-reads the gathered [B, Eb, D] buffer (the round
    trip the tiled SpMM pays)."""
    b, eb, d = xg.shape

    def kernel(xg_ref, o_ref):
        o_ref[0] = jnp.broadcast_to(jnp.sum(xg_ref[0], axis=0)[None],
                                    (8, d))

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, eb, d), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 8, d), xg.dtype),
        interpret=_interpret(),
    )(xg)


def bench(fn, *args, iters=20):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(n=169_343, d=162, e=2_370_000, eb=512, dtype="bfloat16"):
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(rng.randn(n, d), dt)
    bblocks = e // eb
    idx = jnp.asarray(rng.randint(0, n, (bblocks, eb)), jnp.int32)
    flat = idx.reshape(-1)
    bytes_rows = bblocks * eb * d * x.dtype.itemsize

    t_g = bench(lambda f: x[f], flat)
    t_rt = bench(lambda f: consume_sum(x[f].reshape(bblocks, eb, d)), flat)
    t_dma = bench(functools.partial(dma_gather_sum, eb=eb), x, idx)

    out = {
        "n": n, "d": d, "edges": bblocks * eb, "eb": eb, "dtype": dtype,
        "xla_gather_ms": round(t_g * 1e3, 2),
        "xla_gather_gbps": round(bytes_rows / t_g / 1e9, 1),
        "xla_roundtrip_ms": round(t_rt * 1e3, 2),
        "pallas_dma_ms": round(t_dma * 1e3, 2),
        "pallas_dma_gbps": round(bytes_rows / t_dma / 1e9, 1),
        "dma_per_row_ns": round(t_dma / (bblocks * eb) * 1e9, 1),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["e"] = int(sys.argv[1])
    main(**kw)
