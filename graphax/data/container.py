"""Dataset container: a Graph plus node features/labels/split masks."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from graphax.sparse.graph import Graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphData:
    """A node-classification dataset (the analog of the reference's PyG
    `Data` + `InMemoryDataset` wrapper, `src/graph_datasets/data.py:34-110`)."""

    graph: Graph
    x: jax.Array                      # [N, F]
    y: jax.Array                      # [N] int labels
    train_mask: jax.Array             # [N] bool
    val_mask: jax.Array
    test_mask: jax.Array
    num_classes: int = dataclasses.field(metadata=dict(static=True))
    pos_encoding: Optional[jax.Array] = None   # [N, P] (Beltrami)

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes

    @property
    def num_features(self) -> int:
        return int(self.x.shape[-1])

    def with_masks(self, train_mask, val_mask, test_mask) -> "GraphData":
        import jax.numpy as jnp

        return dataclasses.replace(
            self, train_mask=jnp.asarray(train_mask),
            val_mask=jnp.asarray(val_mask), test_mask=jnp.asarray(test_mask))

    def with_graph(self, graph: Graph) -> "GraphData":
        return dataclasses.replace(self, graph=graph)

    def with_pos_encoding(self, pos_encoding) -> "GraphData":
        return dataclasses.replace(self, pos_encoding=pos_encoding)
