"""graphax.utils — parameter helpers, stats, meters."""

from graphax.utils.params import (
    linear_init, linear_apply, xavier_normal, constant_init, torch_bias_init,
)
from graphax.utils.stats import mean_confidence_interval, get_sem
from graphax.utils.profiling import profile_trace, ThroughputMeter

__all__ = [
    "linear_init", "linear_apply", "xavier_normal", "constant_init",
    "torch_bias_init", "mean_confidence_interval", "get_sem",
    "profile_trace", "ThroughputMeter",
]
