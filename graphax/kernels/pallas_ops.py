"""Pallas TPU kernels.

`flash_masked_attention`: streaming-softmax ("flash") masked graph attention
for the dense strategy — ``out = softmax_row(QKᵀ ⊙ adjacency) @ V`` without
ever materializing the [N, N] score matrix. The dense-path XLA version
(graphax.kernels.dense_path) writes + re-reads H·N² f32 scores per NFE;
this kernel streams K/V/mask tiles through VMEM with a running-max running-
denominator accumulator (the standard flash recurrence), reading only the
int8 adjacency mask (N² bytes) per evaluation. Extends the dense-operator
strategy to CoauthorCS/Pubmed-scale attention recomputation.

Numerics: matches `masked_softmax` (empty rows → zero output; denominator
guarded). Runs in interpreter mode on CPU for the parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref,
                  acc_ref):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jnp.dot(q_ref[:], k_ref[:].T,
                preferred_element_type=jnp.float32)        # [Bq, Bk]
    # int8 mask keeps HBM traffic at N² bytes; widen before comparing
    # (Mosaic has no int8 vector compare)
    live = mask_ref[:].astype(jnp.int32) > 0
    s = jnp.where(live, s, NEG)

    m_prev = m_ref[:]                                      # [Bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(live, p, 0.0)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[:], preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] /
                    jnp.maximum(l_ref[:], 1e-16)).astype(o_ref.dtype)


def flash_masked_attention(q, k, v, mask, *, block_q: int = 256,
                           block_k: int = 512, interpret: bool = False):
    """Single-head ``softmax_row(q @ kᵀ masked) @ v``.

    q, k: [N, dk] (pre-scaled by 1/√dk for scaled-dot); v: [N, D];
    mask: [N, N] int8/bool adjacency (nonzero = edge present).
    N must be divisible by block sizes after padding (pad with mask=0)."""
    n, dk = q.shape
    d = v.shape[-1]
    bq = min(block_q, n)
    bk = min(block_k, n)
    assert n % bq == 0 and n % bk == 0, \
        f"pad N={n} to a multiple of ({bq}, {bk})"
    grid = (n // bq, n // bk)

    return pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, dk), lambda qb, kb: (qb, 0)),
            pl.BlockSpec((bk, dk), lambda qb, kb: (kb, 0)),
            pl.BlockSpec((bk, d), lambda qb, kb: (kb, 0)),
            pl.BlockSpec((bq, bk), lambda qb, kb: (qb, kb)),
        ],
        out_specs=pl.BlockSpec((bq, d), lambda qb, kb: (qb, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), v.dtype),
        scratch_shapes=[
            _vmem((bq, 1), jnp.float32),
            _vmem((bq, 1), jnp.float32),
            _vmem((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask.astype(jnp.int8))


def _vmem(shape, dtype):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, dtype)


def pad_to_multiple(x, multiple: int, axis: int = 0, value=0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def flash_attention_multihead(q, k, v, mask, *, block_q: int = 256,
                              block_k: int = 512, interpret: bool = False):
    """q, k: [N, H, dk] → per-head flash attention on shared values
    v [N, D]; returns [H, N, D]. Pads N internally."""
    n = q.shape[0]
    m = max(block_q, block_k)
    qp = pad_to_multiple(jnp.moveaxis(q, 1, 0), m, axis=1)   # [H, Np, dk]
    kp = pad_to_multiple(jnp.moveaxis(k, 1, 0), m, axis=1)
    vp = pad_to_multiple(v, m, axis=0)
    np_ = qp.shape[1]
    maskp = jnp.zeros((np_, np_), jnp.int8).at[:n, :n].set(
        mask.astype(jnp.int8))

    run = functools.partial(flash_masked_attention, block_q=block_q,
                            block_k=block_k, interpret=interpret)
    out = jax.vmap(lambda qh, kh: run(qh, kh, vp, maskp))(qp, kp)
    return out[:, :n]
