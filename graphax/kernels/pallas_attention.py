"""Pallas TPU fused transformer-attention RHS (tiled strategy).

Streaming version of `graphax.kernels.fused_attention.fused_attention_ax`:
the XLA block-layout path materializes ~6 E-sized tensors in HBM per NFE
(gathered keys, one-hots, scores, exponentials, denominator broadcasts,
weighted values). Here the chain runs as three Pallas kernels over the
``RowTiles`` block grid, keeping everything but two E-sized score buffers in
VMEM:

- ``K1 scores``: K-projection of the gathered sources, per-edge per-head
  scores (scaled_dot / cosine_sim / pearson / exp_kernel), optional
  pre-normalization edge reweighting, and the per-(tile-row, head) running
  max (the segment-softmax shift; reference `src/utils.py:116-127`).
- ``K2 normalize``: exp / squareplus of the shifted scores and the
  per-(row, head) denominator accumulation.
- ``K3 spmm``: head-mean attention × gathered source features, one-hot
  matmul into the output tile (same revisited-accumulation pattern as
  `pallas_tiled._spmm_kernel`).

Semantics match the XLA paths exactly: softmax shifts by the per-segment
max, squareplus by the global max (reference `src/utils.py:129-140`), both
normalize with a ``+1e-16`` denominator guard.

Differentiation: ``jax.custom_vjp``. The GRAND-nl default config
(scaled_dot, row softmax) has a full Pallas backward (B1/B2/B3 below);
other configs replay the XLA fused path's vjp — correct everywhere, at the
cost of one extra XLA forward per backward step (dispatch:
`functions/transformer.py` + `FuncState.fast_attention`).

Round-2 coverage (VERDICT #6): col-normalized softmax/squareplus
(``attention_norm_idx=1``, the Cora/Citeseer/CoauthorCS tuned configs) via
transpose-layout denominators; Beltrami product-kernel scores via the
combined [D, 2A] K-weight; flash heads cap replaced by a VMEM estimate;
squareplus flash as a two-pass (global shift precompute) sweep.

Replaces: per-NFE SDDMM+softmax+SpMM of the reference GRAND-nl hot loop
(`src/function_transformer_attention.py:159-267`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphax.kernels.pallas_tiled import (
    _interpret, _tile_rows, blocked_values, first_flags, presence_scale,
)

NEG = -1e30
SCAL_N = 8  # scal vector width: [ov2, inv2l2, ov2_p, inv2l2_p, gshift, pad...]
EPS = 1e-16
COS_EPS = 1e-5


def _sds(shape, dtype, vma=None):
    """ShapeDtypeStruct carrying the shard_map varying-axes set when the
    kernels run inside `shard_map` (strict vma checking requires pallas
    out_shapes to state how outputs vary over mesh axes)."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


# ----------------------------------------------------------------------
# Shared per-block score math (K1 / flash / gmax kernels)
# ----------------------------------------------------------------------

def _score_math(att_type, heads, q_t, k_t, scal_ref):
    """[A, Eb] projected q/k → [H, Eb] scores. ``beltrami_exp`` interprets
    the projections as the concatenation [feat-A | pos-A] built by the
    combined-weight trick in ``_prep`` (kx = feat@Kx and kp = pos@Kp are
    both linear in the full state, so one [D, 2A] matmul serves both) and
    multiplies the two Gaussian kernels
    (`src/function_transformer_attention.py:205-222`)."""
    a = q_t.shape[0]
    if att_type == "beltrami_exp":
        half = a // 2
        d_k = half // heads
        qx = q_t[:half].reshape(heads, d_k, -1)
        qp = q_t[half:].reshape(heads, d_k, -1)
        kx = k_t[:half].reshape(heads, d_k, -1)
        kp = k_t[half:].reshape(heads, d_k, -1)
        sq_x = jnp.sum((qx - kx) ** 2, axis=1)
        sq_p = jnp.sum((qp - kp) ** 2, axis=1)
        return (scal_ref[0, 0] * jnp.exp(-sq_x * scal_ref[0, 1])
                * scal_ref[0, 2] * jnp.exp(-sq_p * scal_ref[0, 3]))
    d_k = a // heads
    q_h = q_t.reshape(heads, d_k, -1)
    k_h = k_t.reshape(heads, d_k, -1)
    if att_type == "scaled_dot":                           # q pre-scaled
        return jnp.sum(q_h * k_h, axis=1)                  # [H, Eb]
    if att_type in ("cosine_sim", "pearson"):
        if att_type == "pearson":
            q_h = q_h - q_h.mean(axis=1, keepdims=True)
            k_h = k_h - k_h.mean(axis=1, keepdims=True)
        qn = jnp.maximum(jnp.sqrt(jnp.sum(q_h * q_h, axis=1)), COS_EPS)
        kn = jnp.maximum(jnp.sqrt(jnp.sum(k_h * k_h, axis=1)), COS_EPS)
        return jnp.sum(q_h * k_h, axis=1) / (qn * kn)
    if att_type == "exp_kernel":
        sq = jnp.sum((q_h - k_h) ** 2, axis=1)
        return scal_ref[0, 0] * jnp.exp(-sq * scal_ref[0, 1])
    raise ValueError(att_type)


# ----------------------------------------------------------------------
# K1: scores + per-row max
# ----------------------------------------------------------------------

def _make_scores_kernel(att_type: str, reweight: bool, heads: int):
    def kernel(tidx_ref, first_ref, q_ref, xg_ref, wk_ref, bk_ref, wb_ref,
               lrow_ref, scal_ref, s_out, rmax_out):
        b = pl.program_id(0)
        lrow = lrow_ref[0, 0]                             # [Eb]
        eb = lrow.shape[0]
        tile = q_ref.shape[1]
        oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == lrow[None, :])                          # [tile, Eb] bool
        oh = oh_b.astype(q_ref.dtype)
        mask_e = (lrow < tile)[None, :]                    # [1, Eb]

        # q[row] per edge: one-hot matmul against the contiguous q tile
        q_t = jax.lax.dot_general(
            q_ref[0], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [A, Eb]
        # k[col] = Wkᵀ x[col] computed on the gathered sources
        k_t = jax.lax.dot_general(
            wk_ref[:], xg_ref[0], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [A, Eb]
        k_t = k_t + bk_ref[0][:, None].astype(jnp.float32)

        s = _score_math(att_type, heads, q_t, k_t, scal_ref)

        if reweight:
            s = s * wb_ref[0, 0][None, :].astype(jnp.float32)
        s = jnp.where(mask_e, s, NEG)
        s_out[0] = s

        rows = []
        for h in range(heads):
            masked = jnp.where(oh_b, s[h][None, :], NEG)   # [tile, Eb]
            rows.append(jnp.max(masked, axis=1))           # [tile]
        rmax = jnp.stack(rows)                             # [H, tile]

        @pl.when(first_ref[b] == 1)
        def _init():
            rmax_out[0] = rmax

        @pl.when(first_ref[b] == 0)
        def _acc():
            rmax_out[0] = jnp.maximum(rmax_out[0], rmax)

    return kernel


def _scores_call(att_type, reweight, heads, q_tiles, xg, wk, bk, wb,
                 local_row, tile_idx, scal, num_tiles, tile, vma=None):
    b, eb, d = xg.shape
    a = q_tiles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tile, a), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((wk.shape[0], a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, SCAL_N), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, heads, tile), lambda i, t, f: (t[i], 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_scores_kernel(att_type, reweight, heads),
        grid_spec=grid_spec,
        out_shape=[
            _sds((b, heads, eb), jnp.float32, vma=vma),
            _sds((num_tiles, heads, tile), jnp.float32, vma=vma),
        ],
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), q_tiles, xg, wk, bk,
      wb[:, None], local_row[:, None], scal)


# ----------------------------------------------------------------------
# K2: shifted exp / squareplus + denominators
# ----------------------------------------------------------------------

def _make_norm_kernel(square_plus: bool):
    def kernel(tidx_ref, first_ref, s_ref, shift_ref, lrow_ref, e_out,
               denom_out):
        b = pl.program_id(0)
        lrow = lrow_ref[0, 0]
        eb = lrow.shape[0]
        tile = shift_ref.shape[2]
        oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == lrow[None, :])
        oh = oh_b.astype(jnp.float32)
        mask_e = (lrow < tile)[None, :]

        shift_e = jax.lax.dot_general(
            shift_ref[0], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [H, Eb]
        z = s_ref[0] - shift_e
        if square_plus:
            e = (z + jnp.sqrt(z * z + 4.0)) / 2.0
        else:
            e = jnp.exp(z)
        e = jnp.where(mask_e, e, 0.0)
        e_out[0] = e

        dpart = jax.lax.dot_general(
            e, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [H, tile]

        @pl.when(first_ref[b] == 1)
        def _init():
            denom_out[0] = dpart

        @pl.when(first_ref[b] == 0)
        def _acc():
            denom_out[0] += dpart

    return kernel


def _norm_call(square_plus, scores, shift, local_row, tile_idx,
               num_tiles, tile, vma=None):
    b, heads, eb = scores.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, heads, tile), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, heads, tile), lambda i, t, f: (t[i], 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_norm_kernel(square_plus),
        grid_spec=grid_spec,
        out_shape=[
            _sds((b, heads, eb), jnp.float32, vma=vma),
            _sds((num_tiles, heads, tile), jnp.float32, vma=vma),
        ],
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), scores, shift, local_row[:, None])


# ----------------------------------------------------------------------
# K3: head-mean attention SpMM
# ----------------------------------------------------------------------

def _make_attspmm_kernel(per_edge_denom: bool):
    """``per_edge_denom``: the denominator arrives per edge slot [H, Eb]
    (col-normalized softmax, ``attention_norm_idx=1``) instead of as a row
    tile table to broadcast through the one-hot."""
    def kernel(tidx_ref, first_ref, e_ref, denom_ref, xg_ref, lrow_ref,
               o_ref):
        b = pl.program_id(0)
        lrow = lrow_ref[0, 0]
        eb = lrow.shape[0]
        tile = o_ref.shape[1]
        oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == lrow[None, :])
        oh = oh_b.astype(jnp.float32)
        mask_e = lrow < tile

        if per_edge_denom:
            denom_e = denom_ref[0]                         # [H, Eb]
        else:
            denom_e = jax.lax.dot_general(
                denom_ref[0], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [H, Eb]
        # zero-select, not +EPS: under the global max shift a row far below
        # the global max has a tiny-but-correct denominator that a fixed
        # epsilon would swamp (padded slots have denom_e == 0)
        a = e_ref[0] / jnp.where(denom_e > 0, denom_e, 1.0)
        w = jnp.where(mask_e, jnp.mean(a, axis=0), 0.0)    # [Eb]
        vals = xg_ref[0] * w[:, None].astype(xg_ref.dtype)
        partial = jax.lax.dot_general(
            oh.astype(xg_ref.dtype), vals, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [tile, D]

        @pl.when(first_ref[b] == 1)
        def _init():
            o_ref[0] = partial

        @pl.when(first_ref[b] == 0)
        def _acc():
            o_ref[0] += partial

    return kernel


def _attspmm_call(e, denom, xg, local_row, tile_idx, num_tiles, tile,
                  per_edge_denom: bool = False, vma=None):
    b, eb, d = xg.shape
    heads = e.shape[1]
    if per_edge_denom:
        denom_spec = pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0))
    else:
        denom_spec = pl.BlockSpec((1, heads, tile),
                                  lambda i, t, f: (t[i], 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0)),
            denom_spec,
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, t, f: (t[i], 0, 0)),
    )
    return pl.pallas_call(
        _make_attspmm_kernel(per_edge_denom),
        grid_spec=grid_spec,
        out_shape=_sds((num_tiles, tile, d), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), e, denom, xg, local_row[:, None])


# ----------------------------------------------------------------------
# Single-pass "graph flash attention" kernel (softmax configs, small H)
#
# Fuses K1+K2+K3: per edge block, compute scores, update a running
# per-(row, head) max with flash-style rescaling of the running denominator
# and the per-head weighted-value accumulators, and emit the normalized
# head-mean on each tile's last block. One sweep over the gathered sources
# instead of three, no E-sized score round-trips through HBM, one kernel
# launch per block instead of three. Softmax uses the online recurrence;
# squareplus (shift-variant, global-max shift — `src/utils.py:129-140`)
# precomputes the shift with the max-only kernel and sweeps once with it
# fixed. Head count is bounded only by the VMEM accumulator estimate
# (`flash_applicable`); col normalization stays on the 3-kernel path.
# ----------------------------------------------------------------------


def last_flags(tile_idx):
    """[B] int32 — 1 on the last block of each output tile."""
    return jnp.concatenate([
        (tile_idx[1:] != tile_idx[:-1]).astype(jnp.int32),
        jnp.ones((1,), jnp.int32)])


def _make_flash_kernel(att_type: str, reweight: bool, heads: int,
                       square_plus: bool = False):
    """Single-pass kernel. Softmax mode keeps the online-max recurrence;
    squareplus mode (shift-VARIANT, so the reference's global-max shift is
    semantically load-bearing — `src/utils.py:129-140`) takes the
    precomputed global shift in ``scal_ref[0, 4]`` (from ``_gmax_call``)
    and needs no rescaling."""
    def kernel(tidx_ref, first_ref, last_ref, q_ref, xg_ref, wk_ref, bk_ref,
               wb_ref, lrow_ref, scal_ref, o_ref, m_ref, d_ref, acc_ref):
        b = pl.program_id(0)
        lrow = lrow_ref[0, 0]                              # [Eb]
        eb = lrow.shape[0]
        tile = q_ref.shape[1]
        oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == lrow[None, :])                          # [tile, Eb]
        oh = oh_b.astype(q_ref.dtype)
        oh32 = oh_b.astype(jnp.float32)
        mask_e = (lrow < tile)[None, :]

        # ---- scores (same math as _make_scores_kernel) ----
        q_t = jax.lax.dot_general(
            q_ref[0], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [A, Eb]
        k_t = jax.lax.dot_general(
            wk_ref[:], xg_ref[0], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [A, Eb]
        k_t = k_t + bk_ref[0][:, None].astype(jnp.float32)

        s = _score_math(att_type, heads, q_t, k_t, scal_ref)
        if reweight:
            s = s * wb_ref[0, 0][None, :].astype(jnp.float32)
        s = jnp.where(mask_e, s, NEG)

        if square_plus:
            @pl.when(first_ref[b] == 1)
            def _init_sp():
                d_ref[...] = jnp.zeros_like(d_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)

            z = s - scal_ref[0, 4]
            e = (z + jnp.sqrt(z * z + 4.0)) / 2.0
            e = jnp.where(mask_e, e, 0.0)
        else:
            # ---- block row-max, online-softmax state update ----
            rows = []
            for h in range(heads):
                masked = jnp.where(oh_b, s[h][None, :], NEG)
                rows.append(jnp.max(masked, axis=1))
            bmax = jnp.stack(rows)                         # [H, tile]

            @pl.when(first_ref[b] == 1)
            def _init():
                m_ref[...] = bmax
                d_ref[...] = jnp.zeros_like(d_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)

            @pl.when(first_ref[b] == 0)
            def _rescale():
                m_new = jnp.maximum(m_ref[...], bmax)
                # rows not yet visited have m == NEG on both sides:
                # exp(0)=1 is harmless (d, acc are 0 there)
                r = jnp.exp(m_ref[...] - m_new)            # [H, tile]
                d_ref[...] = d_ref[...] * r
                acc_ref[...] = acc_ref[...] * r[:, :, None]
                m_ref[...] = m_new

            m = m_ref[...]                                 # [H, tile]
            shift_e = jax.lax.dot_general(
                m, oh32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [H, Eb]
            e = jnp.exp(s - shift_e)                       # pads: exp(NEG)=0
            e = jnp.where(mask_e, e, 0.0)
        d_ref[...] = d_ref[...] + jax.lax.dot_general(
            e, oh32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [H, tile]
        for h in range(heads):
            vals = xg_ref[0] * e[h][:, None].astype(xg_ref.dtype)
            acc_ref[h] = acc_ref[h] + jax.lax.dot_general(
                oh.astype(xg_ref.dtype), vals, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [tile, D]

        @pl.when(last_ref[b] == 1)
        def _emit():
            att = acc_ref[...] / (d_ref[...][:, :, None] + EPS)
            o_ref[0] = jnp.mean(att, axis=0)               # [tile, D]

    return kernel


def _flash_call(att_type, reweight, heads, q_tiles, xg, wk, bk, wb,
                local_row, tile_idx, scal, num_tiles, tile,
                square_plus=False, vma=None):
    b, eb, d = xg.shape
    a = q_tiles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tile, a), lambda i, t, f, l: (t[i], 0, 0)),
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((wk.shape[0], a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, SCAL_N), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, t, f, l: (t[i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((heads, tile), jnp.float32),
            pltpu.VMEM((heads, tile), jnp.float32),
            pltpu.VMEM((heads, tile, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_flash_kernel(att_type, reweight, heads, square_plus),
        grid_spec=grid_spec,
        out_shape=_sds((num_tiles, tile, d), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), last_flags(tile_idx), q_tiles, xg,
      wk, bk, wb[:, None], local_row[:, None], scal)


def _make_gmax_kernel(att_type: str, reweight: bool, heads: int):
    """Score recompute emitting ONLY the per-(block, head) max — the cheap
    first pass of the two-pass squareplus flash (the global shift must be
    known before normalization; no E-sized score write)."""
    def kernel(tidx_ref, q_ref, xg_ref, wk_ref, bk_ref, wb_ref, lrow_ref,
               scal_ref, bmax_out):
        lrow = lrow_ref[0, 0]
        eb = lrow.shape[0]
        tile = q_ref.shape[1]
        oh = ((jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
               == lrow[None, :])).astype(q_ref.dtype)
        mask_e = (lrow < tile)[None, :]
        q_t = jax.lax.dot_general(
            q_ref[0], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        k_t = jax.lax.dot_general(
            wk_ref[:], xg_ref[0], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        k_t = k_t + bk_ref[0][:, None].astype(jnp.float32)
        s = _score_math(att_type, heads, q_t, k_t, scal_ref)
        if reweight:
            s = s * wb_ref[0, 0][None, :].astype(jnp.float32)
        s = jnp.where(mask_e, s, NEG)
        bmax_out[0] = jnp.max(s, axis=1, keepdims=True).T  # [1, H]

    return kernel


def _gmax_call(att_type, reweight, heads, q_tiles, xg, wk, bk, wb,
               local_row, tile_idx, scal, num_tiles, tile, vma=None):
    b, eb, d = xg.shape
    a = q_tiles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tile, a), lambda i, t: (t[i], 0, 0)),
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((wk.shape[0], a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, SCAL_N), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, heads), lambda i, *_: (i, 0, 0)),
    )
    bmax = pl.pallas_call(
        _make_gmax_kernel(att_type, reweight, heads),
        grid_spec=grid_spec,
        out_shape=_sds((b, 1, heads), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(tile_idx, q_tiles, xg, wk, bk, wb[:, None], local_row[:, None], scal)
    gmax = jnp.max(bmax)
    return jnp.where(gmax <= NEG / 2, 0.0, gmax)


# VMEM budget for the flash accumulators ([H, tile] m/d + [H, tile, D] acc,
# f32) — stays well inside the ~16 MB/core VMEM next to the xg/q blocks
FLASH_VMEM_BYTES = 6 * 1024 * 1024


def flash_applicable(cfg, d: int = None, tile: int = 128) -> bool:
    """Single-pass (softmax) / two-pass (squareplus, global shift
    precomputed by ``_gmax_call``) flash coverage. Col-normalized softmax
    (``attention_norm_idx=1``) cannot finalize a row tile in row-streaming
    order — it keeps the 3-kernel path."""
    if cfg.attention_norm_idx != 0:
        return False
    if d is not None:
        vmem = cfg.heads * tile * 4 * (d + 2)
        if vmem > FLASH_VMEM_BYTES:
            return False
    return True


# ----------------------------------------------------------------------
# Backward kernels (round 2): train=True rides Pallas end to end.
#
# Math (per edge e=(r,c), head h; s scores, α = softmax_row(s), out_r =
# Σ_e mean_h(α_eh)·x_c, cotangent g):
#   da_e   = g_r · x_c                       (SDDMM — B1)
#   dα_eh  = da_e / H
#   ρ_rh   = Σ_{e∈row r} α_eh dα_eh          (row reduce — B1)
#   ds_eh  = α_eh (dα_eh − ρ_rh)             (softmax bwd — B2)
#   dq̃_r   = Σ_{e∈row r} ds_eh k_c           (row reduce — B2)
#   dk_e   = ds_eh q̃_r                       (per edge — B2)
#   dx     = Aᵀ(mean_h α) g  +  dq̃ Qᵀ/√dk  +  (Σ_col dk) Kᵀ
# Row reductions are one-hot matmuls on the row-tiled grid; col reductions
# reuse the transpose layout via the static slot permutation
# (`RowTiles.perm_from_row`) — gathers, never E-sized scatters.
# Covers scaled_dot + row softmax (the GRAND-nl default); other score
# types/normalizations keep the XLA-replay backward.
# ----------------------------------------------------------------------


def _bwd1_kernel(tidx_ref, first_ref, s_ref, shift_ref, denom_ref, g_ref,
                 xg_ref, lrow_ref, amean_out, ah_out, da_out, rho_out):
    b = pl.program_id(0)
    lrow = lrow_ref[0, 0]
    eb = lrow.shape[0]
    tile = g_ref.shape[1]
    heads = s_ref.shape[1]
    oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
            == lrow[None, :])
    oh32 = oh_b.astype(jnp.float32)
    ohT32 = (lrow[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (eb, tile), 1)).astype(jnp.float32)
    mask_e = (lrow < tile)[None, :]

    shift_e = jax.lax.dot_general(
        shift_ref[0], oh32, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [H, Eb]
    e = jnp.exp(s_ref[0] - shift_e)
    e = jnp.where(mask_e, e, 0.0)
    denom_e = jax.lax.dot_general(
        denom_ref[0], oh32, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    alpha = e / jnp.where(denom_e > 0, denom_e, 1.0)       # [H, Eb]
    ah_out[0] = alpha
    amean_out[0, 0] = jnp.where(mask_e[0], jnp.mean(alpha, axis=0), 0.0)

    g_edge = jax.lax.dot_general(
        ohT32, g_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [Eb, D]
    da = jnp.sum(g_edge * xg_ref[0].astype(jnp.float32), axis=1)
    da = jnp.where(mask_e[0], da, 0.0)
    da_out[0, 0] = da

    prod = alpha * (da / heads)[None, :]
    rho_part = jax.lax.dot_general(
        prod, oh32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [H, tile]

    @pl.when(first_ref[b] == 1)
    def _init():
        rho_out[0] = rho_part

    @pl.when(first_ref[b] == 0)
    def _acc():
        rho_out[0] += rho_part


def _bwd1_call(scores, shift, denom, g_tiles, xg, local_row, tile_idx,
               num_tiles, tile, vma=None):
    b, heads, eb = scores.shape
    d = xg.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, heads, tile), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, heads, tile), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, tile, d), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, heads, tile), lambda i, t, f: (t[i], 0, 0)),
        ],
    )
    return pl.pallas_call(
        _bwd1_kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((b, 1, eb), jnp.float32, vma=vma),
            _sds((b, heads, eb), jnp.float32, vma=vma),
            _sds((b, 1, eb), jnp.float32, vma=vma),
            _sds((num_tiles, heads, tile), jnp.float32, vma=vma),
        ],
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), scores, shift, denom, g_tiles, xg,
      local_row[:, None])


def _make_bwd2_kernel(heads: int):
    def kernel(tidx_ref, first_ref, ah_ref, da_ref, rho_ref, xg_ref,
               wk_ref, bk_ref, lrow_ref, dq_out):
        b = pl.program_id(0)
        lrow = lrow_ref[0, 0]
        eb = lrow.shape[0]
        tile = dq_out.shape[1]
        oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == lrow[None, :])
        oh32 = oh_b.astype(jnp.float32)

        rho_e = jax.lax.dot_general(
            rho_ref[0], oh32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [H, Eb]
        dalpha = (da_ref[0, 0] / heads)[None, :]
        ds = ah_ref[0] * (dalpha - rho_e)                  # [H, Eb]

        k_t = jax.lax.dot_general(
            wk_ref[:], xg_ref[0], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [A, Eb]
        k_t = k_t + bk_ref[0][:, None].astype(jnp.float32)
        a = k_t.shape[0]
        d_k = a // heads
        k_h = k_t.reshape(heads, d_k, eb)
        m = (k_h * ds[:, None, :]).reshape(a, eb)          # [A, Eb]
        dq_part = jax.lax.dot_general(
            oh32, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [tile, A]

        @pl.when(first_ref[b] == 1)
        def _init():
            dq_out[0] = dq_part

        @pl.when(first_ref[b] == 0)
        def _acc():
            dq_out[0] += dq_part

    return kernel


def _bwd2_call(heads, ah, da, rho, xg, wk, bk, local_row, tile_idx,
               num_tiles, tile, vma=None):
    b, _, eb = ah.shape
    d = xg.shape[-1]
    a = wk.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, heads, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, heads, tile), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((wk.shape[0], a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, a), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, a), lambda i, t, f: (t[i], 0, 0)),
    )
    return pl.pallas_call(
        _make_bwd2_kernel(heads),
        grid_spec=grid_spec,
        out_shape=_sds((num_tiles, tile, a), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), ah, da, rho, xg, wk, bk,
      local_row[:, None])


def _make_bwd3_kernel(heads: int):
    """TRANSPOSE-side kernel: per col tile, recompute per-edge ds from node
    tables gathered outside (shift/denom/ρ at row_e = tt_col) and emit BOTH
    col-indexed cotangents in one pass:
      dk_c  = Σ_{e: col=c} ds_eh · q̃[row_e]
      dxv_c = Σ_{e: col=c} mean_h(α_eh) · g[row_e]
    This replaces the round-2-draft [E, A] slot-permutation gather that
    profiling showed at ~110 ms/step at arxiv scale — per-edge data is
    GATHERED from small node tables instead of permuted between layouts."""

    def kernel(tidx_ref, first_ref, qg_ref, gg_ref, k_ref, x_ref, se_ref,
               de_ref, re_ref, lrow_ref, dk_out, dxv_out):
        b = pl.program_id(0)
        lrow = lrow_ref[0, 0]
        eb = lrow.shape[0]
        tile = k_ref.shape[1]
        oh_b = (jax.lax.broadcasted_iota(jnp.int32, (tile, eb), 0)
                == lrow[None, :])
        oh32 = oh_b.astype(jnp.float32)
        mask_e = (lrow < tile)[None, :]

        # per-edge k (tile-local cols) and q̃ (gathered rows)
        k_e = jax.lax.dot_general(
            k_ref[0].astype(jnp.float32), oh32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [A, Eb]
        a = k_e.shape[0]
        d_k = a // heads
        qg = qg_ref[0].astype(jnp.float32).T               # [A, Eb]
        q_h = qg.reshape(heads, d_k, eb)
        k_h = k_e.reshape(heads, d_k, eb)
        s = jnp.sum(q_h * k_h, axis=1)                     # [H, Eb]
        se = se_ref[0].astype(jnp.float32).T               # [H, Eb]
        de = de_ref[0].astype(jnp.float32).T
        re = re_ref[0].astype(jnp.float32).T
        e = jnp.where(mask_e, jnp.exp(s - se), 0.0)
        alpha = e / jnp.where(de > 0, de, 1.0)
        # da_e = g[row_e]·x[col_e]: g gathered per edge, x tile-local
        x_e = jax.lax.dot_general(
            x_ref[0].astype(jnp.float32), oh32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [D, Eb]
        da = jnp.sum(gg_ref[0].astype(jnp.float32).T * x_e,
                     axis=0)[None, :]                      # [1, Eb]
        ds = alpha * (da / heads - re)                     # [H, Eb]

        m = (q_h * ds[:, None, :]).reshape(a, eb)          # [A, Eb]
        dk_part = jax.lax.dot_general(
            oh32, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [tile, A]
        amean = jnp.where(mask_e[0], jnp.mean(alpha, axis=0), 0.0)
        gv = gg_ref[0] * amean[:, None].astype(gg_ref.dtype)
        dxv_part = jax.lax.dot_general(
            oh_b.astype(gg_ref.dtype), gv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [tile, D]

        @pl.when(first_ref[b] == 1)
        def _init():
            dk_out[0] = dk_part
            dxv_out[0] = dxv_part

        @pl.when(first_ref[b] == 0)
        def _acc():
            dk_out[0] += dk_part
            dxv_out[0] += dxv_part

    return kernel


def _bwd3_call(heads, qg, gg, k_tiles, x_tiles, se, de, re, local_row,
               tile_idx, num_tiles, tile, vma=None):
    b, eb, a = qg.shape
    d = gg.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, eb, a), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, eb, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, tile, a), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, tile, d), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, eb, heads), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, eb, heads), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, eb, heads), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, eb), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, a), lambda i, t, f: (t[i], 0, 0)),
            pl.BlockSpec((1, tile, d), lambda i, t, f: (t[i], 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_bwd3_kernel(heads),
        grid_spec=grid_spec,
        out_shape=[
            _sds((num_tiles, tile, a), jnp.float32, vma=vma),
            _sds((num_tiles, tile, d), jnp.float32, vma=vma),
        ],
        interpret=_interpret(),
    )(tile_idx, first_flags(tile_idx), qg, gg, k_tiles, x_tiles, se, de, re,
      local_row[:, None])


def pallas_fwd_supported(cfg, tiles_t=None) -> bool:
    """Configs the streaming Pallas forward covers (others use the XLA
    fused block-layout path). ``attention_norm_idx=1`` needs the transpose
    layout for its col denominators."""
    if cfg.mix_features or cfg.multi_modal:
        return False
    if cfg.attention_norm_idx != 0 and (
            tiles_t is None
            or getattr(tiles_t, "perm_from_row", None) is None):
        return False
    return True


def pallas_bwd_supported(cfg) -> bool:
    """Configs whose backward runs as Pallas kernels (others keep the
    XLA-replay backward — still correct, one extra XLA forward)."""
    return (cfg.attention_type == "scaled_dot"
            and cfg.attention_norm_idx == 0
            and not cfg.square_plus
            and not cfg.mix_features
            and not cfg.reweight_attention
            and not (cfg.beltrami and cfg.attention_type == "exp_kernel"))


# ----------------------------------------------------------------------
# Assembled RHS with custom_vjp (backward: Pallas kernels for the GRAND-nl
# default config, XLA-replay fallback otherwise)
# ----------------------------------------------------------------------

def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


def _pad_scal_vals(vals):
    s = jnp.zeros((1, SCAL_N), jnp.float32)
    for i, v in enumerate(vals):
        s = s.at[0, i].set(v)
    return s


def _vma_cast(a, vma):
    """Inside shard_map every pallas operand must carry the same
    varying-axes set; params/constants enter replicated (unvarying) in
    eval-mode shard_maps, so cast them (no-op otherwise)."""
    if not vma:
        return a
    from graphax.dist.mesh import ensure_varying
    for ax in vma:
        a = ensure_varying(a, ax)
    return a


def _prep_inputs(cfg, att_params, x, x_src, edge_weight, t_slot, t_mask,
                 t_col, num_tiles, tile, vma=None):
    """Kernel-operand prep shared by the fused RHS (`_make_fused`) and the
    attention-weights entry (`attention_edge_means_pallas`): q projection
    tiled to the row layout, source rows gathered by col, combined K weight
    (Beltrami packs Kx/Kp into one [D, 2A] matrix so the kernels keep their
    single-matmul dataflow), reweight buffer, scale constants."""
    from graphax.utils.params import linear_apply

    heads = cfg.heads
    beltrami = cfg.beltrami and cfg.attention_type == "exp_kernel"
    if beltrami:
        fh, ph = cfg.feat_hidden_dim, cfg.pos_enc_hidden_dim
        featx = jnp.concatenate([x[:, :fh], x[:, fh + ph:]], axis=1)
        posx = x[:, fh:fh + ph]
        q = jnp.concatenate([linear_apply(att_params["Qx"], featx),
                             linear_apply(att_params["Qp"], posx)],
                            axis=-1)
        q_tiles = _tile_rows(q.astype(x.dtype), num_tiles, tile)
        xg = x_src[t_col]
        awx = att_params["Kx"]["w"].astype(x.dtype)
        awp = att_params["Kp"]["w"].astype(x.dtype)
        a_att = awx.shape[1]
        d_full = x.shape[1]
        wk = jnp.zeros((d_full, 2 * a_att), x.dtype)
        wk = wk.at[:fh, :a_att].set(awx[:fh])
        wk = wk.at[fh + ph:, :a_att].set(awx[fh:])
        wk = wk.at[fh:fh + ph, a_att:].set(awp)
        bk = jnp.concatenate([att_params["Kx"]["b"],
                              att_params["Kp"]["b"]]) \
            .astype(jnp.float32)[None, :]
        scal = _pad_scal_vals([
            att_params["output_var_x"] ** 2,
            1.0 / (2.0 * att_params["lengthscale_x"] ** 2),
            att_params["output_var_p"] ** 2,
            1.0 / (2.0 * att_params["lengthscale_p"] ** 2)])
    else:
        q = linear_apply(att_params["Q"], x)
        if cfg.attention_type == "scaled_dot":
            q = q / jnp.sqrt(jnp.asarray(cfg.attention_dim // heads,
                                         jnp.float32)).astype(q.dtype)
        q_tiles = _tile_rows(q.astype(x.dtype), num_tiles, tile)
        xg = x_src[t_col]
        wk = att_params["K"]["w"].astype(x.dtype)
        bk = att_params["K"]["b"].astype(jnp.float32)[None, :]
        if cfg.attention_type == "exp_kernel":
            if "_ov2" in att_params:
                ov2 = att_params["_ov2"]
                inv2l2 = att_params["_inv2l2"]
            else:
                ov2 = att_params["output_var"] ** 2
                inv2l2 = 1.0 / (2.0 * att_params["lengthscale"] ** 2)
            scal = _pad_scal_vals([ov2, inv2l2])
        else:
            scal = jnp.zeros((1, SCAL_N), jnp.float32)
    if cfg.reweight_attention and edge_weight is not None:
        wb = jnp.where(t_mask, edge_weight[t_slot], 0) \
            .astype(jnp.float32)
    else:
        wb = jnp.zeros(t_slot.shape, jnp.float32)
    pv = lambda a: _vma_cast(a, vma)
    return (pv(q_tiles), pv(xg), pv(wk), pv(bk), pv(wb), pv(scal))


def attention_edge_means_pallas(cfg, att_params, tiles, x,
                                num_edge_slots: int,
                                edge_weight=None, x_src=None,
                                vma_axes=None):
    """Per-edge HEAD-MEAN normalized attention in value-buffer slot order —
    the block-level pinning computation (`AttODEblock` computes attention
    once per forward from x(0) and pins the head mean,
    `src/block_transformer_attention.py:24-31`; mixed and hard blocks do
    the same) on the streaming Pallas kernels instead of the per-edge XLA
    path. Measured at arxiv scale (h=4, attention_dim=160): the XLA pin
    costs 538 ms per forward — more than the whole 16-NFE solve
    (scripts/profile_fwd_breakdown.py); this path costs one kernel sweep
    (~20 ms).

    Returns ``[num_edge_slots]`` float32 (padded slots zero). Row-softmax
    only (``attention_norm_idx=0``, no square_plus — gate with
    :func:`attention_means_supported`). NOT differentiable: no VJP is
    registered on the Pallas calls, so callers must be under
    `stop_gradient` (hard attention) or eval mode.
    """
    heads = cfg.heads
    beltrami = cfg.beltrami and cfg.attention_type == "exp_kernel"
    att_type_eff = "beltrami_exp" if beltrami else cfg.attention_type
    xs = x if x_src is None else x_src
    nt, tl = tiles.num_tiles, tiles.tile
    q_tiles, xg, wk, bk, wb, scal = _prep_inputs(
        cfg, att_params, x, xs, edge_weight, tiles.edge_slot,
        tiles.slot_mask, tiles.col, nt, tl, vma=vma_axes)
    scores, rmax = _scores_call(
        att_type_eff, bool(cfg.reweight_attention), heads, q_tiles, xg,
        wk, bk, wb, tiles.local_row, tiles.tile_idx, scal, nt, tl,
        vma=vma_axes)
    present = presence_scale(tiles.tile_idx, nt) > 0
    rmax = jnp.where(present[:, None, None], rmax, NEG)
    shift = jnp.where(rmax <= NEG / 2, 0.0, rmax)
    e, denom = _norm_call(False, scores, shift, tiles.local_row,
                          tiles.tile_idx, nt, tl, vma=vma_axes)
    # e [B, H, Eb]; denom [T, H, tile] accumulated across a tile's blocks.
    # Per-edge denominator: broadcast back through (tile_idx, local_row).
    lrow = jnp.minimum(tiles.local_row, tl - 1)        # fill rows -> clamp
    d_b = denom[tiles.tile_idx]                        # [B, H, tile]
    d_e = jnp.take_along_axis(d_b, lrow[:, None, :], axis=2)   # [B, H, Eb]
    att = e / jnp.where(d_e > 0, d_e, 1.0)
    mean = jnp.mean(att, axis=1)                       # [B, Eb]
    flat_slot = tiles.edge_slot.reshape(-1)
    flat = jnp.where(tiles.slot_mask.reshape(-1), mean.reshape(-1), 0.0)
    return jnp.zeros((int(num_edge_slots),), jnp.float32) \
        .at[flat_slot].add(flat)


def attention_means_supported(cfg) -> bool:
    """Configs :func:`attention_edge_means_pallas` covers."""
    return (cfg.attention_norm_idx == 0 and not cfg.square_plus
            and not cfg.mix_features and not cfg.multi_modal)


@functools.lru_cache(maxsize=None)
def _make_fused(cfg, num_tiles, tile, block_edges, num_nodes, t_shape=None,
                pallas_bwd=False, num_src=None, vma_axes=None):
    """``t_shape = (num_tiles_t, tile_t)`` describes the transpose layout —
    needed by the Pallas backward (``pallas_bwd=True``) and by the
    col-normalized forward (``attention_norm_idx=1``, whose denominators
    reduce on the transpose layout). Without it: row-normalized forward with
    the XLA-replay backward.

    All entry points take TWO state arrays ``(x, x_src)``: ``x`` feeds the
    q projection on owned rows, ``x_src`` the gathered keys/values (and the
    transpose layout covers ``num_src`` source rows). Single-chip callers
    pass the same array twice (JAX sums the two cotangents back into one);
    the sharded per-NFE path (graphax.dist.model) passes the halo-extended
    local state as ``x_src``, giving it the same streaming kernels with a
    separate ``dx_ext`` cotangent routed back through the halo exchange."""
    from graphax.kernels.fused_attention import fused_attention_ax
    from graphax.kernels.pallas_tiled import _spmm_call
    from graphax.kernels.tiles import RowTiles
    from graphax.utils.params import linear_apply

    heads = cfg.heads
    beltrami = cfg.beltrami and cfg.attention_type == "exp_kernel"
    att_type_eff = "beltrami_exp" if beltrami else cfg.attention_type
    norm1 = cfg.attention_norm_idx != 0
    if num_src is None:
        num_src = num_nodes
    vma = vma_axes

    def _pv(a):
        # inside shard_map every pallas operand must carry the same
        # varying-axes set; params/constants enter replicated (unvarying)
        # in eval-mode shard_maps, so cast them (no-op otherwise)
        if not vma:
            return a
        from graphax.dist.mesh import ensure_varying
        for ax in vma:
            a = ensure_varying(a, ax)
        return a
    if norm1 or pallas_bwd:
        num_tiles_t, tile_t = t_shape

    def _prep(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col):
        return _prep_inputs(cfg, att_params, x, x_src, edge_weight, t_slot,
                            t_mask, t_col, num_tiles, tile, vma=vma)

    def _forward(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
                 t_lrow, t_tidx, tt=None, allow_flash=True,
                 want_residuals=False):
        q_tiles, xg, wk, bk, wb, scal = _prep(att_params, x, x_src,
                                              edge_weight, t_slot, t_mask,
                                              t_col)
        present = presence_scale(t_tidx, num_tiles) > 0
        residuals = None
        use_flash = (allow_flash and not want_residuals and not norm1
                     and flash_applicable(cfg, d=x.shape[1], tile=tile))
        if use_flash:
            if cfg.square_plus:
                # squareplus is shift-variant: precompute the global shift
                # in a cheap max-only pass, then one fixed-shift sweep
                gshift = _gmax_call(
                    att_type_eff, bool(cfg.reweight_attention), heads,
                    q_tiles, xg, wk, bk, wb, t_lrow, t_tidx, scal,
                    num_tiles, tile, vma=vma)
                scal = scal.at[0, 4].set(gshift)
            out = _flash_call(
                att_type_eff, bool(cfg.reweight_attention), heads,
                q_tiles, xg, wk, bk, wb, t_lrow, t_tidx, scal, num_tiles,
                tile, square_plus=bool(cfg.square_plus), vma=vma)
        else:
            scores, rmax = _scores_call(
                att_type_eff, bool(cfg.reweight_attention), heads,
                q_tiles, xg, wk, bk, wb, t_lrow, t_tidx, scal, num_tiles,
                tile, vma=vma)
            rmax = jnp.where(present[:, None, None], rmax, NEG)
            if cfg.square_plus or norm1:
                # norm1 softmax also needs a shift constant across each col
                # group — per-row-tile shifts would break shift-invariance
                gmax = jnp.max(rmax)
                gmax = jnp.where(gmax <= NEG / 2, 0.0, gmax)
                shift = jnp.full_like(rmax, gmax)
            else:
                shift = jnp.where(rmax <= NEG / 2, 0.0, rmax)

            e, denom = _norm_call(bool(cfg.square_plus), scores, shift,
                                  t_lrow, t_tidx, num_tiles, tile, vma=vma)
            if norm1:
                # col denominators: move e onto the transpose layout with
                # the static slot permutation (gather, never a scatter),
                # reduce per col, gather back per edge by col index
                tt_mask, tt_col, tt_lrow, tt_tidx, perm = tt
                b_r, h_r, eb_r = e.shape
                e_flat = jnp.moveaxis(e, 1, 2).reshape(b_r * eb_r, h_r)
                e_t = e_flat[perm].reshape(tt_mask.shape + (h_r,))
                e_t = jnp.where(tt_mask[..., None], e_t, 0.0)
                oh_t = jax.nn.one_hot(tt_lrow, tile_t, dtype=jnp.float32)
                part = jnp.einsum("ber,beh->brh", oh_t, e_t,
                                  preferred_element_type=jnp.float32)
                dn = jax.ops.segment_sum(part, tt_tidx,
                                         num_segments=num_tiles_t,
                                         indices_are_sorted=True)
                denom_n = dn.reshape(num_tiles_t * tile_t, h_r)[:num_src]
                denom_e = jnp.moveaxis(denom_n[t_col], 2, 1)  # [B, H, Eb]
                out = _attspmm_call(e, denom_e, xg, t_lrow, t_tidx,
                                    num_tiles, tile, per_edge_denom=True,
                                    vma=vma)
            else:
                out = _attspmm_call(e, denom, xg, t_lrow, t_tidx, num_tiles,
                                    tile, vma=vma)
                residuals = (scores, shift, denom)
        out = jnp.where(present[:, None, None], out, 0.0)
        out = out.reshape(num_tiles * tile, -1)[:num_nodes].astype(x.dtype)
        return out, residuals

    def _xla_replay(att_params, x, x_src, edge_weight, t_slot, t_mask,
                    t_col, t_lrow, t_tidx, tt=None):
        tiles = RowTiles(edge_slot=t_slot, slot_mask=t_mask, col=t_col,
                         local_row=t_lrow, tile_idx=t_tidx,
                         num_tiles=num_tiles, tile=tile,
                         block_edges=block_edges, num_nodes=num_nodes)
        tiles_t_obj = None
        if tt is not None:
            tt_mask, tt_col, tt_lrow, tt_tidx, perm = tt
            tiles_t_obj = RowTiles(
                edge_slot=jnp.zeros_like(tt_col), slot_mask=tt_mask,
                col=tt_col, local_row=tt_lrow, tile_idx=tt_tidx,
                num_tiles=num_tiles_t, tile=tile_t, block_edges=block_edges,
                num_nodes=num_src, perm_from_row=perm)
        return fused_attention_ax(cfg, att_params, tiles, x,
                                  edge_weight=edge_weight,
                                  tiles_t=tiles_t_obj, x_src=x_src)

    if norm1:
        @jax.custom_vjp
        def f(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
              t_lrow, t_tidx, tt_mask, tt_col, tt_lrow, tt_tidx, perm):
            return _forward(att_params, x, x_src, edge_weight, t_slot,
                            t_mask, t_col, t_lrow, t_tidx,
                            tt=(tt_mask, tt_col, tt_lrow, tt_tidx, perm))[0]

        def fwd(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
                t_lrow, t_tidx, tt_mask, tt_col, tt_lrow, tt_tidx, perm):
            y = f(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
                  t_lrow, t_tidx, tt_mask, tt_col, tt_lrow, tt_tidx, perm)
            return y, (att_params, x, x_src, edge_weight, t_slot, t_mask,
                       t_col, t_lrow, t_tidx, tt_mask, tt_col, tt_lrow,
                       tt_tidx, perm)

        def bwd(res, g):
            (att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
             t_lrow, t_tidx, tt_mask, tt_col, tt_lrow, tt_tidx, perm) = res
            _, vjp = jax.vjp(
                lambda p, xx, xs, ew: _xla_replay(
                    p, xx, xs, ew, t_slot, t_mask, t_col, t_lrow, t_tidx,
                    tt=(tt_mask, tt_col, tt_lrow, tt_tidx, perm)),
                att_params, x, x_src, edge_weight)
            dp, dx, dxs, dew = vjp(g.astype(x.dtype))
            return (dp, dx, dxs, dew, _f0(t_slot), _f0(t_mask), _f0(t_col),
                    _f0(t_lrow), _f0(t_tidx), _f0(tt_mask), _f0(tt_col),
                    _f0(tt_lrow), _f0(tt_tidx), _f0(perm))

        f.defvjp(fwd, bwd)
        return f

    if not pallas_bwd:
        @jax.custom_vjp
        def f(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
              t_lrow, t_tidx):
            return _forward(att_params, x, x_src, edge_weight, t_slot,
                            t_mask, t_col, t_lrow, t_tidx)[0]

        def fwd(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
                t_lrow, t_tidx):
            y = f(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
                  t_lrow, t_tidx)
            return y, (att_params, x, x_src, edge_weight, t_slot, t_mask,
                       t_col, t_lrow, t_tidx)

        def bwd(res, g):
            att_params, x, x_src, edge_weight, t_slot, t_mask, t_col, \
                t_lrow, t_tidx = res
            _, vjp = jax.vjp(
                lambda p, xx, xs, ew: _xla_replay(p, xx, xs, ew, t_slot,
                                                  t_mask, t_col, t_lrow,
                                                  t_tidx),
                att_params, x, x_src, edge_weight)
            dp, dx, dxs, dew = vjp(g.astype(x.dtype))
            return (dp, dx, dxs, dew, _f0(t_slot), _f0(t_mask), _f0(t_col),
                    _f0(t_lrow), _f0(t_tidx))

        f.defvjp(fwd, bwd)
        return f
    d_k = cfg.attention_dim // heads
    scale_c = 1.0 / np.sqrt(d_k)

    def _node_table(tiled):
        """[T, H, tile] row-tile table → [T·tile, H] node-indexed table."""
        return jnp.transpose(tiled, (0, 2, 1)).reshape(
            num_tiles * tile, heads)

    @jax.custom_vjp
    def f(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col, t_lrow,
          t_tidx, tt_col, tt_lrow, tt_tidx):
        return _forward(att_params, x, x_src, edge_weight, t_slot, t_mask,
                        t_col, t_lrow, t_tidx)[0]

    def fwd(att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
            t_lrow, t_tidx, tt_col, tt_lrow, tt_tidx):
        # the 3-kernel forward (not flash) so the softmax residuals exist
        y, (scores, shift, denom) = _forward(
            att_params, x, x_src, edge_weight, t_slot, t_mask, t_col,
            t_lrow, t_tidx, allow_flash=False, want_residuals=True)
        return y, (att_params, x, x_src, edge_weight, scores, shift, denom,
                   t_col, t_lrow, t_tidx, tt_col, tt_lrow, tt_tidx)

    def bwd(res, g):
        (att_params, x, x_src, edge_weight, scores, shift, denom, t_col,
         t_lrow, t_tidx, tt_col, tt_lrow, tt_tidx) = res
        xg = x_src[t_col]
        g_tiles = _tile_rows(g.astype(jnp.float32), num_tiles, tile)
        amean, ah, da, rho = _bwd1_call(scores, shift, denom, g_tiles, xg,
                                        t_lrow, t_tidx, num_tiles, tile,
                                        vma=vma)
        q = linear_apply(att_params["Q"], x) * scale_c   # q̃ (pre-scaled)
        wk = _pv(att_params["K"]["w"].astype(x.dtype))
        bk = _pv(att_params["K"]["b"].astype(jnp.float32)[None, :])
        dq_acc = _bwd2_call(heads, ah, da, rho, xg, wk, bk, t_lrow, t_tidx,
                            num_tiles, tile, vma=vma)
        present = presence_scale(t_tidx, num_tiles) > 0
        dq_acc = jnp.where(present[:, None, None], dq_acc, 0.0)
        dq = dq_acc.reshape(num_tiles * tile, -1)[:num_nodes] * scale_c

        # transpose-side pass (B3): dk and dx_val in one kernel. Per-edge
        # data comes from small node-table gathers at row_e = tt_col —
        # no cross-layout slot permutation (which profiled at ~110 ms).
        # Keep the five gathers SEPARATE: packing the latency-bound tables
        # was measured twice and loses both times — r3 (two wide packs:
        # 65.8 vs 59.7 ms) and r5 (q̃+shift+denom+ρ as one f32 gather:
        # 84.3 ms; shift+denom+ρ only: 62.6 ms; unpacked: 60.0 ms,
        # scripts/bench_train_rhs.py). Independent narrow gathers overlap
        # each other's issue latency; any pack serializes it.
        qb16 = q.astype(x.dtype)
        k = (x_src @ wk + att_params["K"]["b"].astype(x.dtype))
        qg = qb16[tt_col]                                  # [Bt, Ebt, A]
        gg = g.astype(x.dtype)[tt_col]                     # [Bt, Ebt, D]
        k_tiles = _tile_rows(k, num_tiles_t, tile_t)
        x_tiles = _tile_rows(x_src, num_tiles_t, tile_t)
        shift_n = _node_table(shift)
        denom_n = _node_table(denom)
        rho_n = _node_table(rho)
        se = shift_n[tt_col]
        de = denom_n[tt_col]
        re = rho_n[tt_col]
        dkc_t, dxv_t = _bwd3_call(heads, qg, gg, k_tiles, x_tiles, se, de,
                                  re, tt_lrow, tt_tidx, num_tiles_t, tile_t,
                                  vma=vma)
        present_t = presence_scale(tt_tidx, num_tiles_t) > 0
        dk_col = jnp.where(present_t[:, None, None], dkc_t, 0.0) \
            .reshape(num_tiles_t * tile_t, -1)[:num_src]
        dx_val = jnp.where(present_t[:, None, None], dxv_t, 0.0) \
            .reshape(num_tiles_t * tile_t, -1)[:num_src]

        dqw = x.astype(jnp.float32).T @ dq
        dqb = jnp.sum(dq, axis=0)
        dkw = x_src.astype(jnp.float32).T @ dk_col
        dkb = jnp.sum(dk_col, axis=0)
        dx = dq @ att_params["Q"]["w"].astype(jnp.float32).T
        dx_src = (dx_val.astype(jnp.float32)
                  + dk_col @ att_params["K"]["w"].astype(jnp.float32).T)

        dp = jax.tree_util.tree_map(jnp.zeros_like, att_params)
        dp = dict(dp)
        dp["Q"] = {"w": dqw.astype(att_params["Q"]["w"].dtype),
                   "b": dqb.astype(att_params["Q"]["b"].dtype)}
        dp["K"] = {"w": dkw.astype(att_params["K"]["w"].dtype),
                   "b": dkb.astype(att_params["K"]["b"].dtype)}
        dew = jnp.zeros_like(edge_weight)
        return (dp, dx.astype(x.dtype), dx_src.astype(x_src.dtype), dew,
                _f0_of(t_col), _f0_of(t_col), _f0_of(t_col),
                _f0_of(t_lrow), _f0_of(t_tidx),
                _f0_of(tt_col), _f0_of(tt_lrow), _f0_of(tt_tidx))

    f.defvjp(fwd, bwd)
    return f


def _f0_of(a):
    return np.zeros(a.shape, jax.dtypes.float0)


def fused_attention_ax_pallas(cfg, att_params, tiles, x, edge_weight=None,
                              tiles_t=None, x_src=None, vma_axes=None):
    """Streaming Pallas version of `fused_attention.fused_attention_ax`
    (head-mean, row-normalized transformer attention RHS). With ``tiles_t``
    (carrying ``perm_from_row``) and a supported config, the BACKWARD also
    runs as Pallas kernels — train=True forwards ride Pallas end to end.

    ``x_src``: separate gather source for keys/values (``tiles.col``
    indexes it; the transpose layout ``tiles_t`` covers its rows) — the
    sharded per-NFE path passes the halo-extended local state here and the
    backward returns its cotangent separately (routed through the halo
    exchange by the caller's autodiff). Default: ``x``."""
    use_pallas_bwd = (tiles_t is not None
                      and getattr(tiles_t, "perm_from_row", None) is not None
                      and pallas_bwd_supported(cfg))
    if edge_weight is None:
        edge_weight = jnp.zeros(tiles.edge_slot.reshape(-1).shape,
                                jnp.float32)
    xs = x if x_src is None else x_src
    num_src = int(xs.shape[0])
    if cfg.attention_norm_idx != 0:
        # col-normalized: the transpose tables flow through the forward
        # (denominator reduce) and the XLA-replay backward
        f = _make_fused(cfg, tiles.num_tiles, tiles.tile, tiles.block_edges,
                        tiles.num_nodes,
                        t_shape=(tiles_t.num_tiles, tiles_t.tile),
                        num_src=num_src, vma_axes=vma_axes)
        return f(att_params, x, xs, edge_weight, tiles.edge_slot,
                 tiles.slot_mask, tiles.col, tiles.local_row, tiles.tile_idx,
                 tiles_t.slot_mask, tiles_t.col, tiles_t.local_row,
                 tiles_t.tile_idx, tiles_t.perm_from_row)
    if use_pallas_bwd:
        f = _make_fused(cfg, tiles.num_tiles, tiles.tile, tiles.block_edges,
                        tiles.num_nodes,
                        t_shape=(tiles_t.num_tiles, tiles_t.tile),
                        pallas_bwd=True, num_src=num_src,
                        vma_axes=vma_axes)
        return f(att_params, x, xs, edge_weight, tiles.edge_slot,
                 tiles.slot_mask, tiles.col, tiles.local_row, tiles.tile_idx,
                 tiles_t.col, tiles_t.local_row, tiles_t.tile_idx)
    f = _make_fused(cfg, tiles.num_tiles, tiles.tile, tiles.block_edges,
                    tiles.num_nodes, num_src=num_src, vma_axes=vma_axes)
    return f(att_params, x, xs, edge_weight, tiles.edge_slot,
             tiles.slot_mask, tiles.col, tiles.local_row, tiles.tile_idx)
