"""graphax.models — complete GRAND/BLEND model family.

- :func:`make_gnn` — encoder → ODE block → decoder node classifier
  (`src/GNN.py`), with Beltrami, label-trick, MLP, batch-norm, ANODE
  augmentation and fc-out options; also exposes the `forward_encoder` /
  `forward_ODE` sub-entry points used by rewiring (`src/GNN_early.py:102-147`).
- :mod:`graphax.models.early` — early-stop evaluation (the reference's
  `GNNEarly`/`EarlyStopInt` redesigned as a solver observer).
- :func:`make_multimodal_gnn` — batched pixel/token-graph classifier
  (`src/GNN_multi.py`).
- :func:`make_cgnn` — Continuous GNN (ICML'20) baseline (`src/CGNN.py`).
"""

from graphax.models.gnn import GNNModel, make_gnn
from graphax.models.gnn_knn import KNNGNNModel, make_gnn_knn
from graphax.models.early import (
    make_accuracy_observer, best_accuracy_from_observer, evaluate_early_stop,
)
from graphax.models.multimodal import make_multimodal_gnn
from graphax.models.cgnn import make_cgnn

__all__ = [
    "GNNModel", "make_gnn", "KNNGNNModel", "make_gnn_knn",
    "make_accuracy_observer", "best_accuracy_from_observer",
    "evaluate_early_stop", "make_multimodal_gnn", "make_cgnn",
]
