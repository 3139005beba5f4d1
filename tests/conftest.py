"""Test harness configuration.

Forces JAX onto the host CPU platform with 8 virtual devices so that
multi-chip sharding tests run anywhere (the SURVEY §4(g) strategy), and so
that numerics tests see f32 matmuls rather than a TPU's bf16 default.

Note: the environment may pre-register a TPU PJRT plugin via sitecustomize
and pin ``JAX_PLATFORMS``; overriding the env var after interpreter start is
not enough, so we use ``jax.config.update`` (which wins as long as no backend
has been initialised yet — conftest runs before any test imports jax).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
