"""graphax.functions — diffusion right-hand sides f(t, x) = dx/dt.

The reference's L1 layer (`src/function_laplacian_diffusion.py`,
`src/function_transformer_attention.py`, `src/function_GAT_attention.py`,
`src/regularized_ODE_function.py`) as pure functions over parameter pytrees:
``rhs(params, fstate, t, x) -> dx`` with all per-forward state (graph,
attention, x0, second modality) carried explicitly in :class:`FuncState`
instead of being mutated onto module attributes.
"""

from graphax.functions.common import FuncState, DiffusionFunction, apply_alpha_beta
from graphax.functions.laplacian import make_laplacian
from graphax.functions.transformer import (
    make_transformer,
    transformer_attention_init,
    transformer_attention_apply,
)
from graphax.functions.gat import make_gat, gat_attention_init, gat_attention_apply
from graphax.functions.regularizers import make_regularized_rhs, REGULARIZER_NAMES


def get_function(cfg, in_dim: int) -> "DiffusionFunction":
    """Factory keyed on cfg.function, the twin of `set_function`
    (`src/model_configurations.py:31-44`)."""
    if cfg.function == "laplacian":
        return make_laplacian(cfg, in_dim)
    if cfg.function == "transformer":
        return make_transformer(cfg, in_dim)
    if cfg.function == "GAT":
        return make_gat(cfg, in_dim)
    raise ValueError(f"unknown function {cfg.function!r}")


__all__ = [
    "FuncState", "DiffusionFunction", "apply_alpha_beta", "get_function",
    "make_laplacian", "make_transformer", "make_gat",
    "transformer_attention_init", "transformer_attention_apply",
    "gat_attention_init", "gat_attention_apply",
    "make_regularized_rhs", "REGULARIZER_NAMES",
]
