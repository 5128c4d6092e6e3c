"""Pallas TPU kernels for the row-tiled sparse path (see `segment_mxu`).

The XLA tiled path materializes three E-sized intermediates in HBM per SpMM
(the gathered sources ``x[col]``, the one-hot row matrix, and the per-block
partials). At ogbn-arxiv scale (2.37M edges, D=162, bf16) that is ~2 GB of
avoidable traffic per RHS evaluation on top of the irreducible row gather.
These kernels keep everything but the gather in VMEM:

- ``_spmm_kernel`` — per block: build the one-hot of ``local_row`` in
  registers (iota compare), scale the gathered sources by the edge values,
  and one-hot-matmul into the 128-row output tile on the MXU. Blocks of one
  tile are consecutive, so the output block accumulates in VMEM across grid
  steps (revisited-output pattern keyed by the scalar-prefetched
  ``tile_idx``) and flushes exactly once per tile.
- ``_sddmm_kernel`` — the SpMM weight gradient ``dw[e] = g[row_e]·x[col_e]``
  without gathering ``g``: a tile's rows are contiguous, so ``g[row]`` is a
  one-hot matmul of the tile's block against the prefetch-selected g-tile.

``spmm_pallas`` wraps both in a ``jax.custom_vjp``: forward is the SpMM
kernel, ``dx = Aᵀg`` reuses the *same* kernel on the transpose layout
(``Graph.tiles_t``), and ``dw`` is the SDDMM kernel — so both training and
inference ride Pallas. Edge values enter pre-blocked (``[B, Eb]``, built once
per forward by ``blocked_values``) so the solver's scan never re-gathers
them and weight cotangents accumulate across steps in blocked form; the
single blocked→edge-order unblocking happens in the outer vjp of
``blocked_values``.

Numerics match `segment_mxu.tiled_spmm` (f32 accumulation, cast back to the
state dtype) — pinned by tests/test_pallas_tiled.py in interpreter mode.

Replaces: reference torch_scatter/torch_sparse SpMM + its autograd
(`src/function_laplacian_diffusion.py:39-58`, `src/utils.py:116-233`).
"""

from __future__ import annotations

import contextlib
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run in interpreter mode off-TPU so tests exercise kernel logic on CPU."""
    return jax.default_backend() != "tpu"


def blocked_values(edge_values, tiles):
    """[E] edge values → [B, Eb] block layout (0 on padded slots).

    Done once per forward; its autodiff vjp (one E-element scatter-add) runs
    once per training step, outside the solver loop."""
    wb = edge_values[tiles.edge_slot]
    return jnp.where(tiles.slot_mask, wb, 0)


def first_flags(tile_idx):
    """[B] int32 — 1 on the first block of each output tile."""
    return jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (tile_idx[1:] != tile_idx[:-1]).astype(jnp.int32)])


def presence_scale(tile_idx, num_tiles):
    """[T] float — 1 for tiles that own at least one block. Tiles with no
    edges are never visited by the kernel, so their output block is
    uninitialized memory; multiply it away."""
    return jnp.zeros((num_tiles,), jnp.float32).at[tile_idx].set(1.0)


# ----------------------------------------------------------------------
# Kernels
# ----------------------------------------------------------------------

def _spmm_kernel(tidx_ref, first_ref, xg_ref, w_ref, lrow_ref, o_ref):
    b = pl.program_id(0)
    tile = o_ref.shape[1]
    lrow = lrow_ref[0, 0]                                   # [Eb] int32
    oh = (jax.lax.broadcasted_iota(jnp.int32, (tile, lrow.shape[0]), 0)
          == lrow[None, :]).astype(xg_ref.dtype)            # [tile, Eb]
    vals = xg_ref[0] * w_ref[0, 0][:, None].astype(xg_ref.dtype)  # [Eb, D]
    partial = jax.lax.dot_general(
        oh, vals, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [tile, D]

    @pl.when(first_ref[b] == 1)
    def _init():
        o_ref[0] = partial

    @pl.when(first_ref[b] == 0)
    def _acc():
        o_ref[0] += partial


def _sds(shape, dtype, vma=None):
    """ShapeDtypeStruct carrying the shard_map varying-axes set (strict vma
    checking requires pallas out_shapes to state it)."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def _spmm_call(xg, wb, local_row, tile_idx, num_tiles: int, tile: int,
               vma=None):
    """[B, Eb, D] gathered sources × [B, Eb] values → [T, tile, D] f32."""
    b, eb, d = xg.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, t, f: (t[i], 0, 0)),
    )
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((num_tiles, tile, d), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), xg, wb[:, None], local_row[:, None])


def spmm_tiles_pallas(vals, x, tiles, vma=None):
    """One Pallas tiled SpMM over a RowTiles set with PER-CALL blocking of
    the [cap] value vector (``wb = vals[edge_slot]``) — the sharded model's
    per-shard local compute (graphax.dist.model `_spmm_cv`), where values
    are pinned per forward and the custom VJP lives at the caller. Returns
    [num_nodes, D] in x.dtype; primal only (differentiate at the caller)."""
    wb = jnp.where(tiles.slot_mask, vals[tiles.edge_slot], 0) \
        .astype(jnp.float32)
    xg = x[tiles.col]
    out = _spmm_call(xg, wb, tiles.local_row, tiles.tile_idx,
                     tiles.num_tiles, tiles.tile, vma=vma)
    present = presence_scale(tiles.tile_idx, tiles.num_tiles) > 0
    out = jnp.where(present[:, None, None], out, 0.0)
    # f32 partials — callers summing halves cast at the end
    return out.reshape(tiles.num_tiles * tiles.tile, -1)[:tiles.num_nodes]


def _sddmm_kernel(tidx_ref, g_ref, xg_ref, lrow_ref, o_ref):
    tile = g_ref.shape[1]
    lrow = lrow_ref[0, 0]                                   # [Eb]
    ohT = (lrow[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (lrow.shape[0], tile), 1)).astype(g_ref.dtype)
    g_edge = jax.lax.dot_general(
        ohT, g_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [Eb, D]
    o_ref[0, 0] = jnp.sum(g_edge * xg_ref[0].astype(jnp.float32), axis=1)


def _sddmm_call(g_tiles, xg, local_row, tile_idx):
    """Per-edge row·col dot products: g_tiles [T, tile, D], xg [B, Eb, D]
    → [B, Eb] f32 (garbage on padded slots — mask downstream)."""
    b, eb, d = xg.shape
    t, tile, _ = g_tiles.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, t: (t[i], 0, 0)),
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, eb), jnp.float32),
        interpret=_interpret(),
    )(tile_idx, g_tiles, xg, local_row[:, None])
    return out[:, 0]


def _tile_rows(x, num_tiles: int, tile: int):
    """[N, D] → [T, tile, D] (zero padding past N)."""
    pad = num_tiles * tile - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))).reshape(num_tiles, tile, -1)


# ----------------------------------------------------------------------
# custom_vjp SpMM
# ----------------------------------------------------------------------

def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


# When True (set by the continuous-adjoint solver around its per-step vjp
# trace — `ode.solvers.odeint_adjoint`), the SpMM custom_vjp saves the
# gathered sources x[col] as a residual, sparing the backward pass one
# random row gather (~10 ms at arxiv scale). NEVER enabled for direct
# autodiff through `lax.scan`: scan STACKS residuals per step, so an
# [E, D]-sized residual would multiply by the step count and exhaust HBM.
_SAVE_SOURCES = False


@contextlib.contextmanager
def adjoint_residual_mode():
    global _SAVE_SOURCES
    old = _SAVE_SOURCES
    _SAVE_SOURCES = True
    try:
        yield
    finally:
        _SAVE_SOURCES = old


@functools.lru_cache(maxsize=None)
def _make_spmm(num_tiles, tile, num_tiles_t, tile_t, num_nodes,
               save_sources: bool = False):

    def _apply(wb, x, tcol, tlrow, ttidx, nt, tl, xg=None):
        if xg is None:
            xg = x[tcol]                                    # [B, Eb, D]
        out = _spmm_call(xg, wb, tlrow, ttidx, nt, tl)
        # never-visited tiles hold uninitialized memory — select, don't
        # multiply (0·NaN = NaN)
        present = presence_scale(ttidx, nt) > 0
        out = jnp.where(present[:, None, None], out, 0.0)
        return out.reshape(nt * tl, -1)[:num_nodes].astype(x.dtype)

    @jax.custom_vjp
    def f(wb, wb_t, x, tcol, tlrow, ttidx, tt_col, tt_lrow, tt_tidx):
        return _apply(wb, x, tcol, tlrow, ttidx, num_tiles, tile)

    def fwd(wb, wb_t, x, tcol, tlrow, ttidx, tt_col, tt_lrow, tt_tidx):
        xg = x[tcol]
        y = _apply(wb, x, tcol, tlrow, ttidx, num_tiles, tile, xg=xg)
        return y, (wb, wb_t, x, xg if save_sources else None,
                   tcol, tlrow, ttidx, tt_col, tt_lrow, tt_tidx)

    def bwd(res, g):
        wb, wb_t, x, xg, tcol, tlrow, ttidx, tt_col, tt_lrow, tt_tidx = res
        g = g.astype(x.dtype)
        # dx = Aᵀ g: the same SpMM kernel on the transpose layout
        dx = _apply(wb_t, g, tt_col, tt_lrow, tt_tidx, num_tiles_t, tile_t)
        # dw[e] = g[row_e] · x[col_e]
        g_tiles = _tile_rows(g, num_tiles, tile)
        if xg is None:
            xg = x[tcol]
        dwb = _sddmm_call(g_tiles, xg, tlrow, ttidx).astype(wb.dtype)
        dwb = jnp.where(tlrow < tile, dwb, 0)
        return (dwb, jnp.zeros_like(wb_t), dx,
                _f0(tcol), _f0(tlrow), _f0(ttidx),
                _f0(tt_col), _f0(tt_lrow), _f0(tt_tidx))

    f.defvjp(fwd, bwd)
    return f


def spmm_pallas(wb, wb_t, x, tiles, tiles_t):
    """``y = A @ x`` with pre-blocked edge values, differentiable.

    wb / wb_t: [B, Eb] edge values in the row-tiled / transpose layouts
    (from :func:`blocked_values`, numerically identical views of the same
    [E] vector); x: [N, D]. Gradients flow to wb and x (wb_t receives
    zeros — its contribution is wb's, routed by the caller building both
    from one [E] array)."""
    f = _make_spmm(tiles.num_tiles, tiles.tile,
                   tiles_t.num_tiles, tiles_t.tile, tiles.num_nodes,
                   save_sources=_SAVE_SOURCES)
    return f(wb, wb_t, x, tiles.col, tiles.local_row, tiles.tile_idx,
             tiles_t.col, tiles_t.local_row, tiles_t.tile_idx)


# Test hook: force-route through the (interpreted) Pallas path off-TPU.
FORCE = False


def pallas_tiled_ok(graph, x) -> bool:
    """Route to the Pallas path: tiled strategy with a transpose layout,
    unbatched state, on a real TPU (interpreter mode is for tests only)."""
    return (graph.strategy == "tiled" and graph.tiles is not None
            and getattr(graph, "tiles_t", None) is not None
            and x.ndim == 2
            and (jax.default_backend() == "tpu" or FORCE))
