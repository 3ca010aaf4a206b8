"""Persistent compilation cache helper (VERDICT r2 #3; CPU gate r5).

The axon-backend speedup itself (~180 s -> seconds for the b32 encode
compile) is measured in experiments/try_compile_cache.py; here we pin the
config plumbing, the round-5 CPU gate (XLA:CPU AOT deserialization of
cached MULTI-DEVICE executables stalls a collective participant and the
rendezvous watchdog SIGABRTs the process — the round-4 full-suite killer),
and that mesh collectives survive the documented production env setting.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.utils.compile_cache import (
    disable_compile_cache,
    enable_compile_cache,
    enable_from_env,
)


def test_enable_compile_cache_populates(tmp_path):
    # force=True bypasses the CPU gate: single-device CPU entries are safe
    # (and this pins the config plumbing + that a jit writes to the dir).
    d = str(tmp_path / "cache")
    got = enable_compile_cache(d, force=True)
    assert got == os.path.abspath(d)
    assert jax.config.jax_compilation_cache_dir == got

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x

    np.asarray(f(jnp.ones((128, 128), jnp.float32)))
    assert len(os.listdir(d)) >= 1  # executable written

    disable_compile_cache()
    assert jax.config.jax_compilation_cache_dir is None


def test_cpu_gate_is_noop(tmp_path):
    """On the cpu backend enable_compile_cache must refuse (round-5 fix)."""
    assert jax.default_backend() == "cpu"
    assert enable_compile_cache(str(tmp_path / "gated")) is None
    assert jax.config.jax_compilation_cache_dir is None
    assert not os.path.exists(str(tmp_path / "gated"))


def test_enable_from_env(tmp_path, monkeypatch):
    monkeypatch.delenv("PLIP_TPU_COMPILE_CACHE", raising=False)
    assert enable_from_env() is None
    # With the env set, the cpu gate still applies on this test backend —
    # on axon/TPU (production) the same call returns the path.
    monkeypatch.setenv("PLIP_TPU_COMPILE_CACHE", str(tmp_path / "envcache"))
    assert enable_from_env() is None
    assert jax.config.jax_compilation_cache_dir is None


def test_mesh_collectives_with_cache_env(tmp_path, monkeypatch):
    """Regression for the round-4 SIGABRT (VERDICT r4 weak #1).

    PLIP_TPU_COMPILE_CACHE=<fresh dir> + a multi-device collective program
    re-traced by a FRESH jit in the same process used to take the persistent
    cache's AOT-load path and abort the process via the rendezvous watchdog.
    The cpu gate makes the documented production setting safe here.
    """
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    monkeypatch.setenv("PLIP_TPU_COMPILE_CACHE", str(tmp_path / "cc"))
    enable_from_env()

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))

    def mk():
        # a fresh jit closure each time: the second one is what used to hit
        # the broken persistent-cache deserialization path
        def body(x):
            return jax.lax.psum(x, ("dp", "tp"))

        return jax.jit(
            shard_map(body, mesh=mesh, in_specs=P("dp", "tp"),
                      out_specs=P(None, None))
        )

    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    a = np.asarray(mk()(x))
    b = np.asarray(mk()(x))
    np.testing.assert_allclose(a, b)
