"""Beltrami positional encodings + GDC/two-hop rewiring application.

Twin of `apply_beltrami` / `apply_gdc` / `get_two_hop` / `make_symmetric` /
`dirichlet_energy` (`src/graph_rewiring.py:34-119,277-315`): positional
encodings are GDC diffusion columns (NMF-compressed for big graphs) or
DeepWalk embeddings, cached as pickles in ``data/pos_encodings/
{dataset}_{type}.pkl`` — DW pickles carry ``{'data', 'acc'}`` exactly like
the reference's `deepwalk_embeddings.py` artifacts."""

from __future__ import annotations

import os
import pickle

import numpy as np

from graphax.data.gdc import gdc_diffusion, gdc_pos_encoding
from graphax.sparse import build
from graphax.sparse.ops import rw_norm_weights


def pos_encoding_path(cache_dir: str, dataset: str, enc_type: str) -> str:
    return os.path.join(cache_dir, "pos_encodings",
                        f"{dataset}_{enc_type}.pkl")


def apply_beltrami(data, cfg, cache_dir: str = "./data", seed: int = 0
                   ) -> np.ndarray:
    """Load or compute the positional encoding matrix [N, P]
    (`src/graph_rewiring.py:277-315`)."""
    enc_type = cfg.pos_enc_type
    path = pos_encoding_path(cache_dir, cfg.dataset, enc_type)
    if os.path.exists(path):
        with open(path, "rb") as f:
            obj = pickle.load(f)
        enc = obj["data"] if isinstance(obj, dict) and "data" in obj else obj
        return np.asarray(enc, dtype=np.float32)

    g = data.graph
    row = np.asarray(g.row)[np.asarray(g.edge_mask)]
    col = np.asarray(g.col)[np.asarray(g.edge_mask)]
    if enc_type.startswith("DW"):
        from graphax.rewiring.deepwalk import deepwalk_embeddings

        dim = int(enc_type[2:] or 64)
        enc, acc = deepwalk_embeddings(row, col, g.num_nodes, dim,
                                       labels=np.asarray(data.y),
                                       seed=seed)
        payload = {"data": enc, "acc": acc}
    elif enc_type == "GDC":
        embedding_dim = None
        if g.num_nodes > 5000:  # arxiv-style NMF compression
            embedding_dim = max(cfg.pos_enc_hidden_dim, 64)
        enc = gdc_pos_encoding(
            row, col, g.num_nodes, orientation=cfg.pos_enc_orientation,
            embedding_dim=embedding_dim, method=cfg.gdc_method,
            alpha=cfg.ppr_alpha, heat_time=cfg.heat_time,
            sparsification=cfg.gdc_sparsification, k=cfg.gdc_k,
            eps=cfg.gdc_threshold)
        payload = enc
    else:
        raise ValueError(f"unknown pos_enc_type {enc_type!r}")

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return np.asarray(enc, dtype=np.float32)


def apply_gdc_rewiring(data, cfg):
    """Replace the graph with the GDC-diffused, sparsified adjacency
    (`apply_gdc`, `src/graph_rewiring.py:42-81`)."""
    g = data.graph
    mask = np.asarray(g.edge_mask)
    row = np.asarray(g.row)[mask]
    col = np.asarray(g.col)[mask]
    r, c, w, _ = gdc_diffusion(
        row, col, g.num_nodes, method=cfg.gdc_method, alpha=cfg.ppr_alpha,
        heat_time=cfg.heat_time, sparsification=cfg.gdc_sparsification,
        k=cfg.gdc_k, eps=cfg.gdc_threshold if cfg.gdc_threshold else None,
        avg_degree=cfg.gdc_avg_degree)
    new_graph = build.build_graph(r, c, g.num_nodes, edge_weight=w,
                                  strategy=g.strategy
                                  if g.strategy != "auto" else "auto")
    return data.with_graph(new_graph)


def apply_two_hop_rewiring(data, cfg=None):
    """`rewiring='two_hop'`: edge set of A + A² (`src/graph_rewiring.py:34-39`)."""
    g = data.graph
    mask = np.asarray(g.edge_mask)
    r, c = build.two_hop(np.asarray(g.row)[mask], np.asarray(g.col)[mask],
                         g.num_nodes)
    return data.with_graph(build.build_graph(r, c, g.num_nodes))


def make_symmetric(graph):
    """A + Aᵀ (weights duplicated, dedup indices) then rw-normalize with no
    self-loop fill (`src/graph_rewiring.py:84-105`). Returns (row, col, w)."""
    mask = np.asarray(graph.edge_mask)
    row = np.asarray(graph.row)[mask]
    col = np.asarray(graph.col)[mask]
    w = np.asarray(graph.edge_weight)[mask]
    r = np.concatenate([row, col])
    c = np.concatenate([col, row])
    ww = np.concatenate([w, w])
    r, c, ww = build.coalesce(r, c, ww, graph.num_nodes)
    import jax.numpy as jnp

    w_norm = rw_norm_weights(jnp.asarray(r), jnp.asarray(c),
                             jnp.asarray(ww, jnp.float32), graph.num_nodes,
                             norm_dim=1)
    return r, c, np.asarray(w_norm)


def dirichlet_energy(graph, x) -> np.ndarray:
    """Xᵀ·A·X (`src/graph_rewiring.py:108-119`) — smoothness diagnostic."""
    import jax.numpy as jnp

    from graphax.kernels.dispatch import spmm_auto

    ax = spmm_auto(graph, graph.edge_weight, jnp.asarray(x))
    return np.asarray(jnp.asarray(x).T @ ax)
