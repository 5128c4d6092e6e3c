"""Attention-layer invariants, mirroring the reference tests
(`test/test_attention.py`, `test/test_transformer_attention.py`):
shapes [E, H]; per-segment sums == 1; values in (0, 1]; symmetric uniform
graph → 0.5 everywhere; Q≈K const-1e-5 init ⇒ near-uniform attention;
head-aggregation equivalence (per-head SpMM then mean == mean-attention
SpMM when values are shared)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax import Config
from graphax.sparse import Graph
from graphax.sparse.ops import attention_spmm, spmm_multihead
from graphax.functions import (
    gat_attention_apply, gat_attention_init,
    transformer_attention_apply, transformer_attention_init,
)

EDGE = np.array([[0, 2, 2, 1], [1, 0, 1, 2]])
# complete graph on 3 nodes (the reference's `edge1`)
EDGE1 = np.array([[0, 0, 1, 1, 2, 2], [1, 2, 0, 2, 0, 1]])
X = jnp.asarray([[1., 2.], [3., 2.], [4., 5.]])
N = 3


def base_cfg(**kw):
    defaults = dict(hidden_dim=2, heads=2, attention_dim=4,
                    attention_norm_idx=0, leaky_relu_slope=0.2,
                    self_loop_weight=1.0)
    defaults.update(kw)
    return Config(**defaults)


def seg_sums(att, idx, n):
    return jax.ops.segment_sum(att, jnp.asarray(idx), num_segments=n)


@pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim", "pearson",
                                      "exp_kernel"])
def test_transformer_attention_invariants(att_type):
    cfg = base_cfg(attention_type=att_type)
    g = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=8)
    params = transformer_attention_init(jax.random.PRNGKey(0), cfg, 2)
    att, (v, prods) = transformer_attention_apply(params, cfg, g, X)
    assert att.shape == (8, 2)
    assert v.shape == (N, 2, 2)
    # row-normalized: per-source sums == 1 (attention_norm_idx=0)
    sums = seg_sums(att, g.row, N)
    for s in np.unique(EDGE[0]):
        np.testing.assert_allclose(sums[s], np.ones(2), rtol=1e-5)
    real = np.asarray(att[:4])
    assert real.min() > 0 and real.max() <= 1 + 1e-6
    assert float(jnp.abs(att[4:]).max()) == 0.0  # padding inert


def test_transformer_uniform_at_init():
    """Constant-1e-5 weight init ⇒ Q ≈ K ⇒ uniform attention
    (`test/test_transformer_attention.py:98-106`)."""
    cfg = base_cfg(attention_type="scaled_dot")
    g = Graph.from_edges(EDGE1[0], EDGE1[1], N)
    params = transformer_attention_init(jax.random.PRNGKey(1), cfg, 2)
    att, _ = transformer_attention_apply(params, cfg, g, X)
    # each source has exactly 2 out-edges on the complete graph → 0.5 each
    np.testing.assert_allclose(att, 0.5 * np.ones((6, 2)), atol=1e-3)


def test_gat_attention_invariants():
    cfg = base_cfg()
    g = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=8)
    params = gat_attention_init(jax.random.PRNGKey(2), cfg, 2)
    att, wx = gat_attention_apply(params, cfg, g, X)
    assert att.shape == (8, 2)
    assert wx.shape == (N, 4)
    sums = seg_sums(att, g.row, N)
    for s in np.unique(EDGE[0]):
        np.testing.assert_allclose(sums[s], np.ones(2), rtol=1e-5)


def test_gat_symmetric_uniform():
    """Uniform features on a symmetric complete graph ⇒ attention 0.5
    (`test/test_attention.py:78-90`)."""
    cfg = base_cfg()
    g = Graph.from_edges(EDGE1[0], EDGE1[1], N)
    params = gat_attention_init(jax.random.PRNGKey(3), cfg, 2)
    att, _ = gat_attention_apply(params, cfg, g, jnp.ones((3, 2)))
    np.testing.assert_allclose(att, 0.5 * np.ones((6, 2)), rtol=1e-5)


def test_head_aggregation_equivalence():
    """Per-head SpMM then head-mean == mean-attention SpMM when all heads
    share values (`test/test_transformer_attention.py:118-143`)."""
    rng = np.random.RandomState(0)
    g = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=8)
    att = jnp.asarray(rng.rand(8, 2), jnp.float32) * g.edge_mask[:, None]
    x = jnp.asarray(rng.randn(N, 3), jnp.float32)
    xh = jnp.broadcast_to(x[:, None, :], (N, 2, 3))
    per_head = spmm_multihead(g.row, g.col, att, xh, N).mean(axis=1)
    mean_first = attention_spmm(g.row, g.col, att, x, N, mask=g.edge_mask)
    np.testing.assert_allclose(per_head, mean_first, rtol=1e-5)


def test_squareplus_attention_path():
    cfg = base_cfg(square_plus=True)
    g = Graph.from_edges(EDGE[0], EDGE[1], N, edge_buffer_size=8)
    params = transformer_attention_init(jax.random.PRNGKey(4), cfg, 2)
    att, _ = transformer_attention_apply(params, cfg, g, X)
    sums = seg_sums(att, g.row, N)
    for s in np.unique(EDGE[0]):
        np.testing.assert_allclose(sums[s], np.ones(2), rtol=1e-4)


def test_beltrami_exp_kernel_attention():
    cfg = Config(heads=2, attention_dim=4, beltrami=True,
                 attention_type="exp_kernel", feat_hidden_dim=3,
                 pos_enc_hidden_dim=2, pos_enc_dim=2, hidden_dim=5)
    in_dim = 5  # feat 3 + pos 2
    g = Graph.from_edges(EDGE[0], EDGE[1], N)
    params = transformer_attention_init(jax.random.PRNGKey(5), cfg, in_dim)
    x = jnp.asarray(np.random.RandomState(1).randn(N, in_dim), jnp.float32)
    att, (v, prods) = transformer_attention_apply(params, cfg, g, x)
    assert v is None  # beltrami exp_kernel returns no values (`:216`)
    assert att.shape == (4, 2)
    sums = seg_sums(att, g.row, N)
    for s in np.unique(EDGE[0]):
        np.testing.assert_allclose(sums[s], np.ones(2), rtol=1e-5)
