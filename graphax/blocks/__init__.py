"""graphax.blocks — ODE integrator harnesses (the reference's L2 layer).

Each block couples a diffusion RHS to the solver: normalizes the graph per
forward, optionally pins attention (computed once from x(0) — "linear"
GRAND), optionally sparsifies edges (hard attention), then integrates over
[0, T] threading regularizer accumulators when training.
"""

from graphax.blocks.common import BlockOutput, normalize_graph, integrate
from graphax.blocks.constant import make_constant_block
from graphax.blocks.attention import make_attention_block
from graphax.blocks.mixed import make_mixed_block
from graphax.blocks.hard_attention import make_hard_attention_block
from graphax.blocks.rewire_attention import make_rewire_attention_block
from graphax.blocks.higher_order import make_higher_order_block


def get_block(cfg, in_dim: int):
    """Factory keyed on cfg.block — twin of `set_block`
    (`src/model_configurations.py:17-28`)."""
    makers = {
        "constant": make_constant_block,
        "attention": make_attention_block,
        "mixed": make_mixed_block,
        "hard_attention": make_hard_attention_block,
        "rewire_attention": make_rewire_attention_block,
    }
    if cfg.block not in makers:
        raise ValueError(f"unknown block {cfg.block!r}")
    return makers[cfg.block](cfg, in_dim)


__all__ = [
    "BlockOutput", "normalize_graph", "integrate", "get_block",
    "make_constant_block", "make_attention_block", "make_mixed_block",
    "make_hard_attention_block", "make_rewire_attention_block",
    "make_higher_order_block",
]
