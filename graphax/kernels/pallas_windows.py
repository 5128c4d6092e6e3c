"""Pallas TPU kernels for the windowed (block-dense) SpMM strategy.

See `graphax.kernels.windows` for the layout. The first cut of this path
expanded every edge through a one-hot matmul at EVERY solver evaluation —
measured 0.68x the tiled gather path at arxiv scale (the [Eb, D] f32
accumulator thrashes VMEM). This version hoists the expansion out of the
solve entirely:

- :func:`densify_windows` — ONCE per forward (fstate build), a Pallas
  kernel turns the blocked in-window edge values into dense per-tile
  operator blocks ``A[t] ∈ [tile, W]`` via one-hot matmuls
  (``oh_row [tile, Eb] @ (w ⊙ oh_col) [Eb, W]``, chunked over W). Cells are
  disjoint (edges are coalesced) so cross-block accumulation is exact.
  Backward is the true transpose — a gather of the cotangent at each
  edge's (tile, lrow, lcol) cell.
- per solver evaluation, ``y = A @ x`` on the in-window edges is then a
  pure batched MXU matmul: ``einsum('trw,twd->trd', blocks,
  slab[tile_win])`` — ~2·tile·W·D FLOPs per row tile, independent of the
  edge count, with a sequential slab read. XLA autodiff handles it (the
  slab gather's transpose is a small segment-sum over tiles).
- residual (out-of-window) edges ride the existing custom-vjp gather SpMM
  `pallas_tiled.spmm_pallas` on the residual RowTiles pair.

Numerics: in-window products round once to the value/state dtype inside
the dense blocks (same rounding as the gather path's ``x[col] * w``),
partial sums accumulate in f32; pinned against the XLA segment ops by
tests/test_pallas_windows.py in interpreter mode.

Replaces nothing in the reference (it densifies to [B,N,N] per call,
`src/function_laplacian_diffusion.py:39-58`); this is the TPU-native
answer to torch_sparse SpMM for community-structured graphs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphax.kernels.pallas_tiled import (
    _f0, _interpret, first_flags, spmm_pallas,
)
from graphax.kernels.windows import WindowTiles


def _sds(shape, dtype, vma=None):
    """ShapeDtypeStruct carrying the shard_map varying-axes set (strict vma
    checking requires pallas out_shapes to state it)."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def _densify_kernel(tidx_ref, first_ref, wb_ref, lcol_ref, lrow_ref, o_ref):
    """One block of in-window edges → += into its tile's [tile, W] dense
    operator block (output revisited across the tile's blocks)."""
    b = pl.program_id(0)
    tile = o_ref.shape[1]
    w = o_ref.shape[2]
    lcol = lcol_ref[0, 0]                                  # [Eb]
    lrow = lrow_ref[0, 0]                                  # [Eb]
    vals = wb_ref[0, 0]                                    # [Eb]
    eb = lcol.shape[0]
    dtype = o_ref.dtype

    oh_r = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
            == lrow[None, :]).astype(dtype)                # [tile, Eb]
    # minor-dim insertion on sub-32-bit vectors is unsupported by Mosaic:
    # reshape [Eb] -> [Eb, 1] in f32, cast after the broadcast
    v32 = vals.astype(jnp.float32)[:, None]
    for c in range(0, w, tile):
        cw = min(tile, w - c)       # last chunk may be partial (w < tile
        #                             in small-window test configs)
        # w_oh[e, j] = w_e · 1[lcol_e == c + j]; padded slots (lcol == W)
        # match nothing → zero columns
        w_oh = jnp.where(
            lcol[:, None] - c
            == jax.lax.broadcasted_iota(jnp.int32, (eb, cw), 1),
            v32, 0.0).astype(dtype)
        partial = jax.lax.dot_general(
            oh_r, w_oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

        @pl.when(first_ref[b] == 1)
        def _init():
            o_ref[0, :, c:c + cw] = partial

        @pl.when(first_ref[b] == 0)
        def _acc():
            o_ref[0, :, c:c + cw] += partial


def _densify_call(wb, lcol, lrow, tile_idx, num_tiles: int, tile: int,
                  window: int, vma=None):
    b, eb = wb.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, window), lambda i, t, f: (t[i], 0, 0)),
    )
    return pl.pallas_call(
        _densify_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((num_tiles, tile, window), wb.dtype, vma=vma),
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), wb[:, None], lcol[:, None],
      lrow[:, None])


def _densify_xla(wb, lcol, lrow, tile_idx, num_tiles: int, tile: int,
                 window: int):
    """jnp twin of the densify kernel — CPU-mesh tests run this (pallas
    interpret mode cannot run under strict-vma shard_map). One scatter per
    FORWARD, not per NFE."""
    valid = (lrow < tile) & (lcol < window)
    flat = (tile_idx[:, None] * (tile * window)
            + jnp.minimum(lrow, tile - 1) * window
            + jnp.minimum(lcol, window - 1))
    size = num_tiles * tile * window
    flat = jnp.where(valid, flat, size)        # OOB sentinel slot dropped
    dense = jnp.zeros((size + 1,), wb.dtype) \
        .at[flat.reshape(-1)].add(jnp.where(valid, wb, 0).reshape(-1))
    return dense[:size].reshape(num_tiles, tile, window)


@functools.lru_cache(maxsize=None)
def _make_densify(num_tiles, tile, window, vma=None, use_pallas=True):

    def _primal(win_wb, lcol, lrow, tile_idx, present):
        if not use_pallas:
            return _densify_xla(win_wb, lcol, lrow, tile_idx, num_tiles,
                                tile, window)
        out = _densify_call(win_wb, lcol, lrow, tile_idx, num_tiles, tile,
                            window, vma=vma)
        # never-visited tiles hold uninitialized memory — select, not scale
        return jnp.where(present[:, None, None], out, 0)

    @jax.custom_vjp
    def f(win_wb, lcol, lrow, tile_idx, present):
        return _primal(win_wb, lcol, lrow, tile_idx, present)

    def fwd(win_wb, lcol, lrow, tile_idx, present):
        return _primal(win_wb, lcol, lrow, tile_idx, present), \
            (lcol, lrow, tile_idx, present)

    def bwd(res, g):
        lcol, lrow, tile_idx, present = res
        # d w[b, e] = g[tile_idx[b], lrow[b, e], lcol[b, e]] on valid slots
        valid = (lrow < tile) & (lcol < window)
        flat = (tile_idx[:, None] * (tile * window)
                + jnp.minimum(lrow, tile - 1) * window
                + jnp.minimum(lcol, window - 1))
        dw = jnp.where(valid, g.reshape(-1)[flat], 0)
        return dw, _f0(lcol), _f0(lrow), _f0(tile_idx), _f0(present)

    f.defvjp(fwd, bwd)
    return f


def densify_windows(win_wb, wt: WindowTiles, vma=None, use_pallas=True):
    """Blocked in-window edge values → dense [T, tile, W] operator blocks
    (differentiable; run ONCE per forward, not per solver evaluation).
    ``vma``/``use_pallas``: shard_map plumbing — varying mesh axes for the
    Pallas out_shapes, and the jnp twin for CPU meshes."""
    f = _make_densify(wt.num_tiles, wt.tile, wt.window, vma=vma,
                      use_pallas=use_pallas)
    t = jnp.zeros(wt.num_tiles, jnp.int32).at[wt.tile_idx].add(1)
    present = t > 0
    return f(win_wb, wt.lcol, wt.local_row, wt.tile_idx, present)


def _slab(x, num_windows: int, window: int):
    pad = num_windows * window - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))).reshape(num_windows, window, -1)


def _win_matmul_kernel(winid_ref, dense_ref, slab_ref, o_ref):
    """out[t] = dense[t] @ slab[tile_win[t]] — the slab block is selected
    by scalar prefetch, so consecutive tiles sharing a window reuse the
    resident copy instead of re-fetching (no [T, W, D] materialization)."""
    o_ref[0] = jax.lax.dot_general(
        dense_ref[0], slab_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _win_matmul_call(dense, slab, tile_win, vma=None):
    t, tile, w = dense.shape
    wn, _, d = slab.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, tile, w), lambda i, wi: (i, 0, 0)),
            pl.BlockSpec((1, w, d), lambda i, wi: (wi[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, wi: (i, 0, 0)),
    )
    return pl.pallas_call(
        _win_matmul_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((t, tile, d), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(tile_win, dense, slab)


def _win_bwd_dense_kernel(winid_ref, g_ref, slab_ref, o_ref):
    """d_dense[t] = g[t] @ slab[tile_win[t]]^T — same streaming structure
    as the forward (slab block by scalar prefetch), transposed contraction.
    Replaces the autodiff path's [T, W, D] per-tile slab materialization."""
    o_ref[0] = jax.lax.dot_general(
        g_ref[0], slab_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _win_bwd_dense_call(g_tiles, slab, tile_win, vma=None):
    t, tile, d = g_tiles.shape
    wn, w, _ = slab.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, wi: (i, 0, 0)),
            pl.BlockSpec((1, w, d), lambda i, wi: (wi[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, w), lambda i, wi: (i, 0, 0)),
    )
    return pl.pallas_call(
        _win_bwd_dense_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((t, tile, w), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(tile_win, g_tiles, slab)


def _win_bwd_slab_kernel(order_ref, winof_ref, first_ref, dense_ref, g_ref,
                         o_ref):
    """d_slab[win] = Σ_{t: tile_win[t]=win} dense[t]^T @ g[t], visited in
    window-sorted tile order so same-window accumulation happens on a
    RESIDENT output block (first-flag init). Replaces autodiff's [T, W, D]
    d_per_tile materialization + E-sized segment_sum."""
    i = pl.program_id(0)
    part = jax.lax.dot_general(                        # contract tile rows
        dense_ref[0], g_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [W, D]

    @pl.when(first_ref[i] == 1)
    def _init():
        o_ref[0] = part

    @pl.when(first_ref[i] == 0)
    def _acc():
        o_ref[0] += part


def _win_bwd_slab_call(dense, g_tiles, tile_win, num_windows, vma=None):
    t, tile, w = dense.shape
    d = g_tiles.shape[-1]
    order = jnp.argsort(tile_win)
    winof = tile_win[order]
    first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (winof[1:] != winof[:-1]).astype(jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, tile, w), lambda i, o, wi, f: (o[i], 0, 0)),
            pl.BlockSpec((1, tile, d), lambda i, o, wi, f: (o[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, w, d), lambda i, o, wi, f: (wi[i], 0, 0)),
    )
    out = pl.pallas_call(
        _win_bwd_slab_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((num_windows, w, d), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(order, winof, first, dense, g_tiles)
    # windows no tile maps to keep whatever was in the buffer — zero them
    present = jax.ops.segment_sum(
        jnp.ones_like(tile_win, jnp.float32), tile_win,
        num_segments=num_windows) > 0
    return jnp.where(present[:, None, None], out, 0.0)


@functools.lru_cache(maxsize=None)
def _make_win_matmul(num_tiles, tile, window, num_windows, num_nodes,
                     vma=None, use_pallas=True, num_src=None):
    """``num_src``: rows of the gather source ``x`` (the slab) when it
    differs from the output row count ``num_nodes`` — the sharded model's
    halo-window call reads the halo-extended state but emits owned rows."""
    if num_src is None:
        num_src = num_nodes

    def _primal(dense, x, tile_win):
        slab = _slab(x, num_windows, window)
        if not use_pallas:
            # jnp twin (CPU meshes): same math, [T, W, D] take materialized
            out = jnp.einsum("trw,twd->trd", dense.astype(x.dtype),
                             jnp.take(slab, tile_win, axis=0),
                             preferred_element_type=jnp.float32)
        else:
            out = _win_matmul_call(dense, slab, tile_win, vma=vma)
        return out.reshape(num_tiles * tile, -1)[:num_nodes]

    @jax.custom_vjp
    def f(dense, x, tile_win):
        return _primal(dense, x, tile_win)

    def fwd(dense, x, tile_win):
        return _primal(dense, x, tile_win), (dense, x, tile_win)

    def bwd(res, g):
        dense, x, tile_win = res
        gp = jnp.pad(g, ((0, num_tiles * tile - num_nodes), (0, 0))) \
            .reshape(num_tiles, tile, -1).astype(x.dtype)
        slab = _slab(x, num_windows, window)
        if use_pallas:
            # streaming kernels: no [T, W, D] per-tile slab / cotangent
            # materialization (the autodiff transposes were the measured
            # residue keeping the sharded windowed path behind plain
            # tiles — SCALING.md r4.2)
            d_dense = _win_bwd_dense_call(gp, slab, tile_win, vma=vma) \
                .astype(dense.dtype)
            d_slab = _win_bwd_slab_call(dense.astype(x.dtype), gp,
                                        tile_win, num_windows, vma=vma)
        else:
            per_tile = jnp.take(slab, tile_win, axis=0)    # bwd-only gather
            d_dense = jnp.einsum("trd,twd->trw", gp, per_tile,
                                 preferred_element_type=jnp.float32) \
                .astype(dense.dtype)
            d_per_tile = jnp.einsum("trw,trd->twd", dense.astype(x.dtype),
                                    gp, preferred_element_type=jnp.float32)
            d_slab = jax.ops.segment_sum(d_per_tile, tile_win,
                                         num_segments=num_windows)
        dx = d_slab.reshape(num_windows * window, -1)[:num_src] \
            .astype(x.dtype)
        return d_dense, dx, _f0(tile_win)

    f.defvjp(fwd, bwd)
    return f


def spmm_windowed(dense, res_wb, res_wb_t, x, wt: WindowTiles,
                  dense_hub=None):
    """``y = A @ x`` on the windowed layout, differentiable.

    ``dense``: [T, tile, W] in-window operator blocks from
    :func:`densify_windows`; ``res_wb`` / ``res_wb_t``: blocked residual
    edge values (all produced per forward from one [E] vector — fstate
    build; see `blocks.common.make_fstate`). With ``dense_hub`` (and
    ``wt.hub``), the residual's hub edges ride the dense hub-slab matmul
    (kernels.hubs) and ``res_wb``/``res_wb_t`` are the HUB-FREE residual
    blocks on ``wt.hub.rest``/``rest_t``; otherwise they cover the full
    residual on ``wt.residual``/``residual_t``. Gradients flow to every
    value view and ``x``."""
    f = _make_win_matmul(wt.num_tiles, wt.tile, wt.window, wt.num_windows,
                         wt.num_nodes)
    out = f(dense, x, wt.tile_win)                         # [N, D] f32
    if dense_hub is not None and wt.hub is not None:
        from graphax.kernels.hubs import spmm_hub

        out = out + spmm_hub(dense_hub, x, wt.hub)
        res = spmm_pallas(res_wb, res_wb_t, x, wt.hub.rest, wt.hub.rest_t)
    else:
        res = spmm_pallas(res_wb, res_wb_t, x, wt.residual, wt.residual_t)
    return (out + res.astype(jnp.float32)).astype(x.dtype)


# Test hook, mirroring pallas_tiled.FORCE
FORCE = False


def pallas_windowed_ok(graph, x) -> bool:
    return (graph.strategy == "windowed" and graph.windows is not None
            and x.ndim == 2
            and (jax.default_backend() == "tpu" or FORCE))


def win_matmul(dense, x, tile_win, *, num_tiles, tile, window, num_windows,
               num_nodes, num_src=None, vma=None, use_pallas=True):
    """Just the in-window half of :func:`spmm_windowed` (custom-vjp batched
    MXU matmuls over the dense blocks), exposed for callers that route the
    residual separately — the sharded model runs the residual + halo on its
    own overlap-split tiled path (graphax.dist.model). Returns [num_nodes,
    D] f32; ``x`` may have ``num_src`` rows (halo-extended)."""
    f = _make_win_matmul(num_tiles, tile, window, num_windows, num_nodes,
                         vma=vma, use_pallas=use_pallas, num_src=num_src)
    return f(dense, x, tile_win)
