"""graphax.data — datasets, splits, graph builders, positional encodings.

Replaces the reference's L5 layer (`src/graph_datasets/data.py`,
`heterophilic.py`, `DIGL_data.py`, `src/data_multi.py`) without the
torch/PyG dependency: NumPy parsers for the on-disk formats, scipy-based
LCC/diffusion, and synthetic generators for hermetic tests and benches
(this build environment has no network egress — loaders are file-gated and
raise a clear error naming the files they need).
"""

from graphax.data.container import GraphData
from graphax.data.splits import (
    set_train_val_test_split, planetoid_split_masks,
)
from graphax.data.lcc import largest_connected_component
from graphax.data.synthetic import make_sbm_dataset, make_synthetic_cora
from graphax.data.grids import grid_edge_index, chain_edge_index
from graphax.data.gdc import gdc_diffusion, exact_ppr_matrix, heat_kernel_matrix
from graphax.data.loaders import get_dataset
from graphax.data.reorder import community_reorder
from graphax.data.clevr import build_clevr_hdf5, load_clevr

__all__ = [
    "GraphData", "set_train_val_test_split", "planetoid_split_masks",
    "largest_connected_component", "make_sbm_dataset", "make_synthetic_cora",
    "grid_edge_index", "chain_edge_index", "gdc_diffusion",
    "exact_ppr_matrix", "heat_kernel_matrix", "get_dataset",
    "community_reorder", "build_clevr_hdf5", "load_clevr",
]
