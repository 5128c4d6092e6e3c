"""Run statistics: mean / std / sem / 95% t-CI over repeated runs.

Twin of `src/utils.py:236-268` and the reporting in `src/run_best_ray.py:69-74`.
Implemented without scipy's stats import at module scope so it stays cheap."""

from __future__ import annotations

import numpy as np


def get_sem(vec) -> float:
    """Standard error of the mean (`src/utils.py:258-268`)."""
    a = np.asarray(vec, dtype=np.float64)
    if a.size <= 1:
        return 0.0
    return float(a.std(ddof=1) / np.sqrt(a.size))


def mean_confidence_interval(data, confidence: float = 0.95) -> float:
    """Half-width of the t-distribution CI (`src/utils.py:236-249`)."""
    a = np.asarray(data, dtype=np.float64)
    n = a.size
    if n < 2:
        return 0.0
    from scipy import stats  # preprocessing-only dependency

    se = a.std(ddof=1) / np.sqrt(n)
    return float(se * stats.t.ppf((1 + confidence) / 2.0, n - 1))


def summarize_runs(values) -> dict:
    a = np.asarray(values, dtype=np.float64)
    return {
        "mean": float(a.mean()) if a.size else float("nan"),
        "std": float(a.std(ddof=1)) if a.size > 1 else 0.0,
        "sem": get_sem(a),
        "ci95": mean_confidence_interval(a),
        "n": int(a.size),
    }
