"""Test configuration: force an 8-device virtual CPU platform.

Multi-device logic (shard_map DP, halo-exchange partitioning) is tested on the
CPU backend with 8 virtual devices — the jax-native "fake backend" for
multi-chip tests without a pod (SURVEY.md §4).  The env var alone is not
enough on this machine (the axon TPU plugin registers regardless), so we also
update the config before the backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Keep f32 matmuls full-precision in numerics tests (TPU default would be
# bf16-accumulated; parity tests compare against numpy oracles).
jax.config.update("jax_default_matmul_precision", "highest")
