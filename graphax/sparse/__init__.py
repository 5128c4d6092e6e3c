"""graphax.sparse — static-shape sparse graph container and segment kernels.

TPU-first design: graph *topology construction* (coalescing, self-loops,
undirected symmetrization, padding to static buckets) happens host-side in
NumPy (`graphax.sparse.build`); everything executed per-step on device
(normalization weights, SpMM, SDDMM, segment softmax) is jittable with static
shapes (`graphax.sparse.ops`), so XLA sees one fixed program regardless of the
true edge count — padding is masked, never branched on.
"""

from graphax.sparse.graph import Graph
from graphax.sparse import build
from graphax.sparse.ops import (
    segment_sum,
    segment_max,
    segment_mean,
    segment_softmax,
    squareplus_norm,
    spmm,
    spmm_multihead,
    sddmm_dot,
    rw_norm_weights,
    gcn_norm_weights,
)

__all__ = [
    "Graph",
    "build",
    "segment_sum",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "squareplus_norm",
    "spmm",
    "spmm_multihead",
    "sddmm_dot",
    "rw_norm_weights",
    "gcn_norm_weights",
]
