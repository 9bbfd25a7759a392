"""Test environment: force an 8-virtual-device CPU JAX backend.

The dev container registers the `axon` TPU PJRT plugin from sitecustomize
and pins `jax_platforms` to "axon,cpu"; tests must instead run on a
multi-device CPU mesh so shard_map/ring-collective code paths are
exercised without TPU hardware (SURVEY.md §4 "distributed without a
cluster"). The config updates below only work before backend
initialization, so this module must not be imported after any jax
computation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # backend already initialized (e.g. single-test reruns)
    pass

# Oracle/kernel comparisons require deterministic float32 contractions.
jax.config.update("jax_default_matmul_precision", "highest")
