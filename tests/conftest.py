"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths (shard_map/pjit over a Mesh) are exercised without TPU
hardware — the standard JAX trick from SURVEY.md §4.

Note: this environment pre-imports jax from sitecustomize (axon TPU
plugin), so env vars are too late — use jax.config.update, which works
as long as no backend has been initialised yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
