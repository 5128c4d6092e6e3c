"""graphax — a TPU-native graph neural diffusion (GRAND/BLEND) framework.

A from-scratch JAX/XLA/Pallas implementation of continuous graph diffusion
models (GRAND, ICML'21; BLEND, NeurIPS'21) with the full capability surface of
the reference `graph-neural-pde` repository, re-designed TPU-first:

- ``graphax.sparse``   — static-shape padded graph container + segment kernels
- ``graphax.ode``      — fixed/adaptive ODE solvers under jit (scan/while_loop),
                         custom_vjp adjoint, early-stop observers
- ``graphax.functions``— diffusion right-hand sides (laplacian / transformer /
                         GAT attention) and FFJORD-style regularizers
- ``graphax.blocks``   — ODE blocks (constant / attention / mixed / hard / rewire)
- ``graphax.models``   — encoder→ODE→decoder GNNs, Beltrami, multimodal, CGNN
- ``graphax.data``     — dataset loaders, splits, grid/chain graph builders
- ``graphax.train``    — typed config, train/eval loops, sweeps, checkpoints
- ``graphax.dist``     — mesh/sharding, edge partitioning, halo exchange
- ``graphax.kernels``  — Pallas TPU kernels for the hot ops
"""

__version__ = "0.1.0"

from graphax.sparse.graph import Graph  # noqa: F401
from graphax.train.config import Config  # noqa: F401


def __getattr__(name):
    # lazy convenience exports (keep base import light)
    if name in ("odeint", "odeint_adjoint", "Observer"):
        import graphax.ode as m

        return getattr(m, name)
    if name in ("Trainer", "best_config", "BEST_PARAMS"):
        import graphax.train as m

        return getattr(m, name)
    if name in ("get_dataset", "make_sbm_dataset"):
        import graphax.data as m

        return getattr(m, name)
    if name in ("make_gnn", "make_gnn_knn", "make_multimodal_gnn",
                "make_cgnn"):
        import graphax.models as m

        return getattr(m, name)
    raise AttributeError(name)
