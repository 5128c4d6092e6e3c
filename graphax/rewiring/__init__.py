"""graphax.rewiring — graph surgery & positional encodings (reference L5a).

The reference's `src/graph_rewiring.py` + `distances_kNN.py` +
`hyperbolic_distances.py` + `pos_enc_factorisation.py` +
`graph_datasets/deepwalk_embeddings.py`, rebuilt TPU-first: distance/top-k
compute runs on device (`lax.top_k` replaces the pykeops `argKmin` CUDA
path), while topology assembly happens at the host epoch boundary where the
Graph's static buffers are rebuilt (capacity-preserving when possible).
"""

from graphax.rewiring.knn import knn_graph, apply_knn, rewire_graph_with_edges
from graphax.rewiring.sampling import (
    edge_sampling, add_edges, add_outgoing_attention_edges,
    apply_edge_sampling,
)
from graphax.rewiring.beltrami import (
    apply_beltrami, apply_gdc_rewiring, apply_two_hop_rewiring,
    make_symmetric, dirichlet_energy,
)
from graphax.rewiring.distances import (
    poincare_distances, knn_from_distances, quantile_threshold_adjacency,
    apply_pos_dist_rewire,
)
from graphax.rewiring.deepwalk import deepwalk_embeddings

__all__ = [
    "knn_graph", "apply_knn", "rewire_graph_with_edges", "edge_sampling",
    "add_edges", "add_outgoing_attention_edges", "apply_edge_sampling",
    "apply_beltrami", "apply_gdc_rewiring", "apply_two_hop_rewiring",
    "make_symmetric", "dirichlet_energy", "poincare_distances",
    "knn_from_distances", "quantile_threshold_adjacency",
    "apply_pos_dist_rewire", "deepwalk_embeddings",
]
