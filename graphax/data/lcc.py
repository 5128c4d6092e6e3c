"""Largest-connected-component extraction.

The reference BFS-walks components in pure Python (`src/graph_datasets/
data.py:113-134`) — O(N·E) with python sets. Here scipy's
`connected_components` (union-find in C) does it in O(E)."""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp


def largest_connected_component(row, col, num_nodes: int
                                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (keep_nodes [sorted original ids], new_row, new_col) for the
    largest weakly-connected component, with edges remapped to [0, n_lcc)."""
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    from graphax import native

    if native.available():
        keep = native.largest_connected_component(row, col, num_nodes)
        if keep is not None and len(keep) == num_nodes:
            return np.arange(num_nodes), row, col
        if keep is not None:
            mapper = np.full(num_nodes, -1, dtype=np.int64)
            mapper[keep] = np.arange(keep.shape[0])
            edge_keep = (mapper[row] >= 0) & (mapper[col] >= 0)
            return keep, mapper[row[edge_keep]], mapper[col[edge_keep]]
    adj = sp.coo_matrix((np.ones(len(row)), (row, col)),
                        shape=(num_nodes, num_nodes))
    n_comp, labels = sp.csgraph.connected_components(adj, directed=True,
                                                     connection="weak")
    if n_comp == 1:
        return np.arange(num_nodes), row, col
    sizes = np.bincount(labels)
    keep = np.where(labels == sizes.argmax())[0]
    mapper = np.full(num_nodes, -1, dtype=np.int64)
    mapper[keep] = np.arange(keep.shape[0])
    edge_keep = (mapper[row] >= 0) & (mapper[col] >= 0)
    return keep, mapper[row[edge_keep]], mapper[col[edge_keep]]
