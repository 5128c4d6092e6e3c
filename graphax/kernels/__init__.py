"""graphax.kernels — TPU fast paths for the hot sparse ops.

XLA's scatter lowering on TPU serializes (measured ~23 ms for a scalar
segment-sum over 2.4M edges on v5e — ~100× off bandwidth speed-of-light),
while the MXU sits idle. These kernels reformulate every segment reduction
as dense matmuls over a static row-tiled edge layout:

1. host-side, edges (already sorted by row) are cut into ``Eb``-edge blocks
   such that each block's rows fall inside ONE 128-row output tile;
2. on device, each block reduces via ``onehot(local_row)ᵀ @ vals`` — a
   [Eb,128]ᵀ×[Eb,D] MXU matmul with f32 accumulation;
3. block partials combine into tiles with a small sorted segment-sum over
   the (few thousand) blocks.

No scatter touches an E-sized axis. The same tables drive segment-softmax
(max via masked VPU reduce, sum via the matmul) and the fused
SDDMM→softmax→SpMM attention step. A further Pallas fusion lives in
``graphax.kernels.pallas_ops``.
"""

from graphax.kernels.tiles import RowTiles, build_row_tiles
from graphax.kernels.segment_mxu import (
    tiled_segment_sum, tiled_segment_max, tiled_segment_softmax, tiled_spmm,
)
from graphax.kernels.dispatch import (
    attach_windows, spmm_auto, segment_softmax_auto, attention_spmm_auto,
)
from graphax.kernels.windows import (
    WindowTiles, build_window_tiles, community_order,
)

__all__ = [
    "RowTiles", "build_row_tiles", "tiled_segment_sum", "tiled_segment_max",
    "tiled_segment_softmax", "tiled_spmm", "spmm_auto",
    "segment_softmax_auto", "attention_spmm_auto", "attach_windows",
    "WindowTiles", "build_window_tiles", "community_order",
]
