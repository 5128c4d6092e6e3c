"""Test environment: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (see SURVEY §4).

Note: env vars are too late here (the machine's sitecustomize imports jax at
interpreter startup), so we use runtime config updates — they take effect
because backends initialize lazily on first use.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
