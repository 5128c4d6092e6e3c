"""graphax.drivers — training CLIs and experiment harnesses (reference L6).

- :mod:`run_gnn`     — canonical node-classification CLI
  (`src/graph_datasets/run_GNN.py`): best-params merge, repeated splits with
  mean/sem/CI reporting, KNN rewiring, early-stop tracking.
- :mod:`run_multi`   — multimodal / pixel-grid training
  (`src/run_multi.py`): MNIST/CIFAR grid diffusion and CLEVR-style VQA with
  cross-modal attention.
- :mod:`explicit_implicit` — solver-comparison harness
  (`src/run_explicit_implicit_exp.py`): per-method/step-size accuracy, NFE
  and runtime curves, pickled results.
- :mod:`visualize`   — attention graphs and diffusion animations
  (`src/visualise_attention.py`, `src/post_analysis.py`).
"""

from graphax.drivers.run_gnn import main as run_gnn_main
from graphax.drivers.run_multi import main as run_multi_main

__all__ = ["run_gnn_main", "run_multi_main"]
