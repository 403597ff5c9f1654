import os

# Multi-chip tests run on a virtual 8-device CPU mesh; all numerics tests
# also run on CPU so CI does not need TPU hardware.  The MP f64-expansion
# arithmetic requires IEEE float64 (CPU); the axon TPU platform emulates
# f64 without correct rounding, so it must be disabled here.
#
# NOTE: the container's sitecustomize imports jax at interpreter startup
# (registering the axon TPU PJRT plugin) BEFORE this conftest runs, so
# jax has already captured JAX_PLATFORMS=axon from the environment.
# Setting os.environ here is too late; we must go through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from sdpb_tpu.utils import ensure_map_count  # noqa: E402

ensure_map_count()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
