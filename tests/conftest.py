"""Test environment: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (see SURVEY §4).

Note: env vars are too late here (the machine's sitecustomize imports jax at
interpreter startup), so we use runtime config updates — they take effect
because backends initialize lazily on first use.
"""

import os
import sys

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ----------------------------------------------------------------------
# Fast (default) vs full test lanes. Tests that take >100 s are marked
# @pytest.mark.slow and SKIPPED by default so the routine
# `pytest tests/ -x -q` gate stays under ~5 minutes; run everything with
# `pytest --runslow` (or GRAPHAX_RUN_SLOW=1) — the CI full lane does.
# ----------------------------------------------------------------------

def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (>100s)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >100s test, skipped unless --runslow or "
                   "GRAPHAX_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("GRAPHAX_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow (use --runslow or "
                                   "GRAPHAX_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
