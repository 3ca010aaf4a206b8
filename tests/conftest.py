"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the standard way to exercise pjit/shard_map multi-chip code paths
without TPU pod hardware (SURVEY.md §4).
"""

import os
import sys

# repo root importable regardless of pytest invocation directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Hard-set (not setdefault): the driver environment presets JAX_PLATFORMS=axon
# (the real-TPU tunnel) and a sitecustomize registers that backend, so the env
# var alone is not enough — jax.config.update after import is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_compile_cache_config():
    """No test may leak persistent-compile-cache config into later tests.

    The round-4 full-suite SIGABRT was exactly such a leak:
    test_compile_cache enabled jax_compilation_cache_dir globally and the
    mesh-orbax-resume test later aborted inside XLA:CPU's AOT executable
    deserialization (see plip_tpu/utils/compile_cache.py docstring).
    """
    yield
    from plip_tpu.utils.compile_cache import disable_compile_cache

    disable_compile_cache()


@pytest.fixture(scope="session")
def tokenizer():
    from plip_tpu.tokenizer import synthetic_vocab

    return synthetic_vocab()
