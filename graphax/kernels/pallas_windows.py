"""Pallas TPU kernels for the windowed (cluster-dense) SpMM strategy.

See `graphax.kernels.windows` for the layout and the measured motivation:
the tiled path's random row gather is granule-bound at ~3.9 ns/edge; for
community-ordered graphs the in-window edges instead ride the MXU:

- ``_win_spmm_kernel`` — per block: build ``A[e, w] = w_e · 1[lcol_e = w]``
  by iota-compare in registers, one matmul against the window slab
  (``[Eb, W] @ [W, D]``, sequential slab read shared per output tile) to
  expand per-edge source values, then the usual one-hot row reduction into
  the revisited 128-row output tile.
- ``_win_sddmm_kernel`` — the weight gradient on in-window edges with no
  gather at all: both ``g[row_e]`` and ``x[col_e]`` are one-hot matmuls
  against the prefetch-selected g-tile / window slab.

Residual (out-of-window) edges reuse the gather kernels from
`graphax.kernels.pallas_tiled`; the two partial outputs add in f32 before
the cast back to the state dtype, so numerics match `segment_mxu.tiled_spmm`
bit-for-bit in expectation (same bf16 product rounding, f32 accumulation) —
pinned by tests/test_pallas_windows.py in interpreter mode.

``spmm_windowed`` wraps forward/transpose/SDDMM in one ``jax.custom_vjp``
like `pallas_tiled.spmm_pallas`: ``dx = Aᵀg`` runs the same kernels on the
transpose layout, ``dw`` the SDDMM kernels.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphax.kernels.pallas_tiled import (
    _f0, _interpret, _sddmm_call, _spmm_call, first_flags, presence_scale,
)
from graphax.kernels.windows import WindowTiles


def _win_spmm_kernel(tidx_ref, first_ref, winid_ref, slab_ref, wb_ref,
                     lcol_ref, lrow_ref, o_ref):
    b = pl.program_id(0)
    tile = o_ref.shape[1]
    w = slab_ref.shape[1]
    lcol = lcol_ref[0, 0]                                  # [Eb]
    lrow = lrow_ref[0, 0]                                  # [Eb]
    dtype = slab_ref.dtype
    eb = lcol.shape[0]

    # Window expansion xg[e] = slab[lcol_e] as 128-sublane one-hot matmul
    # chunks — (128, Eb) iota-vs-lane-vector compares are the layout the
    # Mosaic compiler supports (wider one-hots fail to relayout); exactly
    # one chunk matches per edge so the f32 chunk sum is exact. Padded
    # slots (lcol == W) match no chunk → zero rows.
    d = slab_ref.shape[2]
    vals32 = jnp.zeros((eb, d), jnp.float32)
    for c in range(0, w, tile):
        oh_c = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == (lcol[None, :] - c)).astype(dtype)      # [128, Eb]
        vals32 += jax.lax.dot_general(
            oh_c, slab_ref[0, c:c + tile, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # per-edge scale by the edge value, rounded to the state dtype exactly
    # like the gather path's xg * w
    vals = vals32.astype(dtype) * wb_ref[0, 0][:, None].astype(dtype)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
          == lrow[None, :]).astype(dtype)                  # [tile, Eb]
    partial = jax.lax.dot_general(
        oh, vals, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [tile, D]

    @pl.when(first_ref[b] == 1)
    def _init():
        o_ref[0] = partial

    @pl.when(first_ref[b] == 0)
    def _acc():
        o_ref[0] += partial


def _win_spmm_call(slab, wb, lcol, lrow, tile_idx, win_id, num_tiles: int,
                   tile: int):
    """slab [Wn, W, D] × blocked values → [T, tile, D] f32 partials."""
    b, eb = wb.shape
    wn, w, d = slab.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, w, d), lambda i, t, f, wi: (wi[i], 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, t, f, wi: (t[i], 0, 0)),
    )
    return pl.pallas_call(
        _win_spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, tile, d), jnp.float32),
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), win_id, slab, wb[:, None],
      lcol[:, None], lrow[:, None])


def _win_sddmm_kernel(tidx_ref, winid_ref, g_ref, slab_ref, lcol_ref,
                      lrow_ref, o_ref):
    tile = g_ref.shape[1]
    w = slab_ref.shape[1]
    lcol = lcol_ref[0, 0]
    lrow = lrow_ref[0, 0]
    eb = lcol.shape[0]
    ohT = (lrow[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (eb, tile), 1)).astype(g_ref.dtype)
    g_e = jax.lax.dot_general(
        ohT, g_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [Eb, D]
    d = slab_ref.shape[2]
    x_e = jnp.zeros((eb, d), jnp.float32)
    for c in range(0, w, tile):
        oh_c = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == (lcol[None, :] - c)).astype(slab_ref.dtype)
        x_e += jax.lax.dot_general(
            oh_c, slab_ref[0, c:c + tile, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Eb, D]
    o_ref[0, 0] = jnp.sum(g_e * x_e, axis=1)


def _win_sddmm_call(g_tiles, slab, lcol, lrow, tile_idx, win_id):
    b, eb = lcol.shape
    t, tile, d = g_tiles.shape
    wn, w, _ = slab.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, t, wi: (t[i], 0, 0)),
            pl.BlockSpec((1, w, d), lambda i, t, wi: (wi[i], 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _win_sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, eb), jnp.float32),
        interpret=_interpret(),
    )(tile_idx, win_id, g_tiles, slab, lcol[:, None], lrow[:, None])
    return out[:, 0]


def _slab(x, num_windows: int, window: int):
    pad = num_windows * window - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))).reshape(num_windows, window, -1)


def _tile_rows(x, num_tiles: int, tile: int):
    pad = num_tiles * tile - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))).reshape(num_tiles, tile, -1)


def _apply(win_wb, res_wb, x, wt: WindowTiles):
    """y = A @ x on one layout: windowed partials + residual gather
    partials, f32 add, presence-masked, cast back."""
    slab = _slab(x, wt.num_windows, wt.window)
    out = _win_spmm_call(slab, win_wb, wt.lcol, wt.local_row, wt.tile_idx,
                         wt.win_id, wt.num_tiles, wt.tile)
    present = presence_scale(wt.tile_idx, wt.num_tiles) > 0
    out = jnp.where(present[:, None, None], out, 0.0)

    res = wt.residual
    xg = x[res.col]
    out_r = _spmm_call(xg, res_wb, res.local_row, res.tile_idx,
                       res.num_tiles, res.tile)
    present_r = presence_scale(res.tile_idx, res.num_tiles) > 0
    out = out + jnp.where(present_r[:, None, None], out_r, 0.0)
    return out.reshape(wt.padded_nodes, -1)[: wt.num_nodes].astype(x.dtype)


def _zeros_layout(wt):
    return jax.tree_util.tree_map(_f0, wt)


@functools.lru_cache(maxsize=None)
def _make_windowed(num_tiles, tile, num_nodes):

    @jax.custom_vjp
    def f(win_wb, res_wb, win_wb_t, res_wb_t, x, wt, wt_t):
        return _apply(win_wb, res_wb, x, wt)

    def fwd(win_wb, res_wb, win_wb_t, res_wb_t, x, wt, wt_t):
        y = _apply(win_wb, res_wb, x, wt)
        return y, (win_wb, res_wb, win_wb_t, res_wb_t, x, wt, wt_t)

    def bwd(res_data, g):
        win_wb, res_wb, win_wb_t, res_wb_t, x, wt, wt_t = res_data
        g = g.astype(x.dtype)
        # dx = Aᵀ g — the same pair of kernels on the transpose layout
        dx = _apply(win_wb_t, res_wb_t, g, wt_t)
        # dw[e] = g[row_e] · x[col_e]
        g_tiles = _tile_rows(g, wt.num_tiles, wt.tile)
        slab = _slab(x, wt.num_windows, wt.window)
        dwin = _win_sddmm_call(g_tiles, slab, wt.lcol, wt.local_row,
                               wt.tile_idx, wt.win_id).astype(win_wb.dtype)
        dwin = jnp.where(wt.local_row < wt.tile, dwin, 0)
        r = wt.residual
        dres = _sddmm_call(g_tiles, x[r.col], r.local_row,
                           r.tile_idx).astype(res_wb.dtype)
        dres = jnp.where(r.local_row < r.tile, dres, 0)
        return (dwin, dres, jnp.zeros_like(win_wb_t),
                jnp.zeros_like(res_wb_t), dx,
                _zeros_layout(wt), _zeros_layout(wt_t))

    f.defvjp(fwd, bwd)
    return f


def spmm_windowed(wb, wb_t, x, wt: WindowTiles, wt_t: WindowTiles):
    """``y = A @ x`` on the windowed layout, differentiable.

    ``wb`` / ``wb_t``: ``(win_values, res_values)`` blocked pairs for the
    forward / transpose layouts (from
    :func:`graphax.kernels.windows.blocked_window_values` — numerically
    identical views of one [E] vector). Gradients flow to ``wb`` and ``x``;
    ``wb_t`` receives zeros, its contribution is routed by the caller
    building both from one array (same convention as ``spmm_pallas``)."""
    f = _make_windowed(wt.num_tiles, wt.tile, wt.num_nodes)
    return f(wb[0], wb[1], wb_t[0], wb_t[1], x, wt, wt_t)


# Test hook, mirroring pallas_tiled.FORCE
FORCE = False


def pallas_windowed_ok(graph, x) -> bool:
    return (graph.strategy == "windowed" and graph.windows is not None
            and getattr(graph, "windows_t", None) is not None
            and x.ndim == 2
            and (jax.default_backend() == "tpu" or FORCE))
