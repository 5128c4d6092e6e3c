"""Device-side jittable sparse graph ops (XLA segment primitives).

These are the reference's "kernel layer" (`src/utils.py:116-233` plus the SpMM
buried in each ODE function) rebuilt for TPU: no densification to ``[N, N]``
(the reference fork does that in `src/function_laplacian_diffusion.py:39-58`
— an O(N²) regression we deliberately do not replicate), everything expressed
as gather + segment-reduce so XLA lowers to fused one-pass scatter kernels.
A Pallas fused path for the hot SDDMM→softmax→SpMM triple lives in
``graphax.kernels`` and is numerically interchangeable with these.

All functions take raw arrays (not the Graph container) so they vmap cleanly
over batched graphs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

EPS = 1e-16  # denominator guard, matching reference softmax/squareplus (+1e-16)


# ----------------------------------------------------------------------
# Segment reductions
# ----------------------------------------------------------------------

def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, mask=None):
    if mask is not None:
        ones = jnp.where(mask, 1.0, 0.0)
        data = jnp.where(_expand(mask, data), data, 0.0)
    else:
        ones = jnp.ones(data.shape[0], dtype=jnp.float32)
    total = segment_sum(data, segment_ids, num_segments)
    count = segment_sum(ones, segment_ids, num_segments)
    return total / jnp.maximum(count, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def _expand(mask, like):
    """Broadcast a [E] mask against [E, ...] data."""
    return mask.reshape(mask.shape + (1,) * (like.ndim - 1))


# ----------------------------------------------------------------------
# Edge-score normalizations
# ----------------------------------------------------------------------

def segment_softmax(scores, segment_ids, num_segments: int, mask=None):
    """Numerically stable softmax over edge segments.

    Behavioral twin of reference `softmax(src, index)` (`src/utils.py:116-127`):
    subtract the per-segment max, exponentiate, divide by the per-segment sum
    plus 1e-16. ``scores`` is ``[E]`` or ``[E, H]``; ``segment_ids`` is ``[E]``.
    Masked (padded) edges get probability 0 and never pollute real segments.
    """
    neg = jnp.asarray(-1e30, scores.dtype)
    s = scores if mask is None else jnp.where(_expand(mask, scores), scores, neg)
    seg_max = segment_max(s, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = s - seg_max[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(_expand(mask, e), e, 0.0)
    denom = segment_sum(e, segment_ids, num_segments)[segment_ids]
    return e / (denom + EPS)


def squareplus_norm(scores, segment_ids, num_segments: int, mask=None):
    """Square-plus edge normalization (reference `squareplus`,
    `src/utils.py:129-140`): shift by the *global* max over real edges, map
    through (x + sqrt(x² + 4)) / 2, normalize by the segment sum (+1e-16).
    """
    neg = jnp.asarray(-1e30, scores.dtype)
    s = scores if mask is None else jnp.where(_expand(mask, scores), scores, neg)
    gmax = jnp.max(s)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    out = s - gmax
    out = (out + jnp.sqrt(out * out + 4.0)) / 2.0
    if mask is not None:
        out = jnp.where(_expand(mask, out), out, 0.0)
    denom = segment_sum(out, segment_ids, num_segments)[segment_ids]
    return out / (denom + EPS)


# ----------------------------------------------------------------------
# Sparse matrix products
# ----------------------------------------------------------------------

def spmm(row, col, weight, x, num_nodes: int):
    """``y = A @ x`` with A in COO form: ``y[i] = Σ_{e: row[e]=i} w[e]·x[col[e]]``.

    Replaces the reference's densify-then-bmm `sparse_multiply`
    (`src/function_laplacian_diffusion.py:39-58`) with gather + segment-sum.
    Padded edges must carry weight 0. ``x: [N, D] → [N, D]``.
    """
    gathered = x[col] * weight.astype(x.dtype)[:, None]
    return segment_sum(gathered, row, num_nodes)


def spmm_multihead(row, col, att, v, num_nodes: int):
    """Per-head SpMM: ``att [E, H]``, ``v [N, H, Dh]`` → ``[N, H, Dh]``.

    The `mix_features` path of the reference's `multiply_attention`
    (`src/function_transformer_attention.py:23-32`).
    """
    gathered = v[col] * att[:, :, None]
    return segment_sum(gathered, row, num_nodes)


def sddmm_dot(row, col, q, k):
    """Sampled dense-dense matmul: per-edge per-head dot products.

    ``q, k: [N, H, Dh]`` → scores ``[E, H]`` with
    ``scores[e, h] = q[row[e], h] · k[col[e], h]``.

    This is the intended semantics of the reference's scaled-dot attention
    (`src/function_transformer_attention.py:240-249`; see SURVEY §8 — the
    fork's permute/matmul variant is an O(E²) bug, upstream reduces per-edge).
    """
    return jnp.einsum("ehd,ehd->eh", q[row], k[col])


# ----------------------------------------------------------------------
# Adjacency normalizations (weights only — topology is fixed at build time)
# ----------------------------------------------------------------------

def rw_norm_weights(row, col, weight, num_nodes: int, norm_dim: int = 1,
                    mask=None):
    """Random-walk normalization of edge weights.

    Twin of `get_rw_adj` after self-loop insertion (`src/utils.py:215-233`):
    degree = scatter-add of weights over ``row`` (norm_dim=0) or ``col``
    (norm_dim=1); weights scaled by 1/degree of that endpoint. Zero-degree
    nodes keep their (zero) weights — the reference's `deg^-1` would produce
    inf there on weights that are then multiplied by 0; we guard explicitly.
    """
    w = weight if mask is None else jnp.where(mask, weight, 0.0)
    idx = row if norm_dim == 0 else col
    deg = segment_sum(w, idx, num_nodes)
    deg_inv = jnp.where(deg > 0, 1.0 / jnp.where(deg > 0, deg, 1.0), 0.0)
    return w * deg_inv[idx]


def gcn_norm_weights(row, col, weight, num_nodes: int, mask=None):
    """Symmetric GCN normalization ``D^{-1/2} A D^{-1/2}``.

    Twin of `gcn_norm_fill_val` after self-loop insertion
    (`src/utils.py:177-194`): degree from scatter over ``col``; inf→0 guard.
    """
    w = weight if mask is None else jnp.where(mask, weight, 0.0)
    deg = segment_sum(w, col, num_nodes)
    deg_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.where(deg > 0, deg, 1.0)), 0.0)
    return deg_inv_sqrt[row] * w * deg_inv_sqrt[col]


def attention_spmm(row, col, attention, x, num_nodes: int, mask=None):
    """Mean-over-heads attention SpMM: ``attention [E, H]``, ``x [N, D]``.

    The non-`mix_features` path of `multiply_attention`
    (`src/function_transformer_attention.py:33-41`).
    """
    mean_att = attention.mean(axis=1)
    if mask is not None:
        mean_att = jnp.where(mask, mean_att, 0.0)
    return spmm(row, col, mean_att, x, num_nodes)
