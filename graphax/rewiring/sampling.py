"""Edge addition / removal rewiring between epochs.

Twin of `edge_sampling` / `add_edges` / `add_outgoing_attention_edges` /
`apply_edge_sampling` (`src/graph_rewiring.py:164-274`). Runs at the host
epoch boundary: score computations use the model's attention layer on
device; topology assembly is NumPy. (The reference's `add_edges` crashes on
`cat.shape(2)` — SURVEY §8; intent implemented.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

from graphax.rewiring.knn import rewire_graph_with_edges
from graphax.sparse import build


def _block_attention(model, block_params, cfg, graph, z, attention_type=None):
    """Head-mean attention (or raw distance scores) per edge via the block's
    attention layer. ``attention_type`` temporarily overrides the score
    space — the reference mutates opt['attention_type'] for this
    (`:174-178`); we rebuild the apply with a replaced frozen config."""
    from graphax.blocks.common import normalize_graph
    from graphax.functions import transformer_attention_apply

    g = normalize_graph(cfg, graph)
    cfg_use = cfg if attention_type is None else \
        cfg.replace(attention_type=attention_type)
    layer_params = block_params.get("att_layer") or \
        block_params["func"]["att"]
    att, (_, prods) = transformer_attention_apply(layer_params, cfg_use, g, z)
    return np.asarray(att.mean(axis=1)), np.asarray(prods.mean(axis=1)), g


def edge_sampling(model, block_params, cfg, graph, z) -> Tuple[np.ndarray,
                                                               np.ndarray]:
    """Remove edges by attention quantile (keep high-attention) or by
    distance quantile (keep close pairs) (`:164-192`). Returns (row, col)."""
    row = np.asarray(graph.row)
    col = np.asarray(graph.col)
    mask_real = np.asarray(graph.edge_mask)

    space = cfg.edge_sampling_space
    if space == "attention":
        mean_att, _, _ = _block_attention(model, block_params, cfg, graph, z)
        vals = mean_att[mask_real]
        threshold = np.quantile(vals, cfg.edge_sampling_rmv)
        keep = vals >= threshold
    elif space in ("pos_distance", "z_distance", "pos_distance_QK",
                   "z_distance_QK"):
        # distance spaces: score = squared distance in (projected) space —
        # reuse the exp_kernel machinery's q−k distances via raw scores
        _, _, g = _block_attention(model, block_params, cfg, graph, z)
        if space.endswith("_QK"):
            _, prods, _ = _block_attention(model, block_params, cfg, graph,
                                           z, attention_type="exp_kernel")
            dist = -np.log(np.maximum(prods, 1e-30))  # kernel → distance
        else:
            zz = np.asarray(z)
            dist = np.sum((zz[row] - zz[col]) ** 2, axis=-1)
        vals = dist[mask_real]
        threshold = np.quantile(vals, 1 - cfg.edge_sampling_rmv)
        keep = vals < threshold
    else:
        raise ValueError(f"unknown edge_sampling_space {space!r}")

    r, c = row[mask_real][keep], col[mask_real][keep]
    if cfg.edge_sampling_sym:
        r, c = build.to_undirected(r, c, graph.num_nodes)
    return r, c


def add_outgoing_attention_edges(rng, graph, mean_att, m: int
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Importance-sample M anchor nodes ∝ softmax of degree-normalized
    incoming attention mass; connect to uniform partners, both directions
    (`:195-215`)."""
    n = graph.num_nodes
    col = np.asarray(graph.col)
    mask = np.asarray(graph.edge_mask)
    att = np.asarray(mean_att)

    importance = np.zeros(n)
    np.add.at(importance, col[mask], att[mask])
    degree = np.zeros(n)
    np.add.at(degree, col[mask], 1.0)
    normed = np.divide(importance, np.maximum(degree, 1.0))
    probs = np.exp(normed - normed.max())
    probs = probs / probs.sum()
    anchors = rng.choice(n, size=m, replace=True, p=probs)
    partners = rng.choice(n, size=m, replace=True)
    row_new = np.concatenate([anchors, partners])
    col_new = np.concatenate([partners, anchors])
    return row_new, col_new


def add_edges(rng, graph, cfg, mean_att=None) -> Tuple[np.ndarray, np.ndarray]:
    """Add ``edge_sampling_add · E`` new edges (random / importance / full
    adjacency), dedup against existing (`:218-257`)."""
    n = graph.num_nodes
    row = np.asarray(graph.row)[np.asarray(graph.edge_mask)]
    col = np.asarray(graph.col)[np.asarray(graph.edge_mask)]
    m = int(len(row) * cfg.edge_sampling_add)

    kind = cfg.edge_sampling_add_type
    if kind == "n2_radius":
        return build.full_adjacency(n)
    if m <= 0:
        return row, col
    if kind == "random":
        new = rng.randint(0, n, size=(2, m))
        row_new = np.concatenate([new[0], new[1]])
        col_new = np.concatenate([new[1], new[0]])
    elif kind == "importance":
        assert mean_att is not None, "importance addition needs attention"
        row_new, col_new = add_outgoing_attention_edges(rng, graph,
                                                        mean_att, m)
    else:
        raise ValueError(f"unsupported edge_sampling_add_type {kind!r}")
    r = np.concatenate([row, row_new])
    c = np.concatenate([col, col_new])
    r, c, _ = build.coalesce(r, c, None, n)
    return r, c


def apply_edge_sampling(cfg, model, params, state, data, rng=None, x2=None):
    """`apply_edge_sampling` (`:260-274`): densify (add) → embed (T0/TN) →
    sample (remove) → new Graph."""
    rng = rng or np.random.RandomState(0)
    block_params = params["block"]

    # attention for importance addition comes from the current graph
    z0, _ = model.encode(params, state, data.x, train=False,
                         pos_encoding=data.pos_encoding, apply_dropout=False)
    mean_att = None
    if cfg.edge_sampling_add_type == "importance":
        mean_att, _, _ = _block_attention(model, block_params, cfg,
                                          data.graph, z0)
    r, c = add_edges(rng, data.graph, cfg, mean_att)
    g_dense = rewire_graph_with_edges(data.graph, r, c,
                                      self_loop_weight=cfg.self_loop_weight,
                                      keep_capacity=False)

    if cfg.edge_sampling_T == "T0":
        z = z0
    else:
        z, _, _ = model.forward_ode(params, state, g_dense, data.x,
                                    train=False,
                                    pos_encoding=data.pos_encoding, x2=x2)
    r2, c2 = edge_sampling(model, block_params, cfg, g_dense, z)
    return rewire_graph_with_edges(data.graph, r2, c2,
                                   self_loop_weight=cfg.self_loop_weight,
                                   keep_capacity=False)
