"""Test environment: run JAX on a simulated 8-device CPU mesh so distributed
(shard_map / psum) paths are exercised without TPU hardware, per SURVEY.md §4.

The session presets JAX_PLATFORMS=axon (TPU tunnel) and partially preimports
jax at interpreter startup, so env-var edits alone don't stick — we must go
through jax.config. XLA_FLAGS is still honored because the CPU client is
created lazily on first use.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
