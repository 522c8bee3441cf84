"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (SURVEY.md §4). This environment pre-imports jax at
interpreter startup with JAX_PLATFORMS=axon (TPU over a network tunnel), so
plain env vars are too late — we must update the jax config at runtime,
before the first backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
