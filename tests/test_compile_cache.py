"""Persistent compilation cache helper (VERDICT r2 #3).

The axon-backend speedup itself (~180 s -> seconds for the b32 encode
compile) is measured in experiments/try_compile_cache.py; here we pin the
config plumbing and that a jit actually populates the cache dir on CPU.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.utils.compile_cache import enable_compile_cache, enable_from_env


def test_enable_compile_cache_populates(tmp_path):
    d = str(tmp_path / "cache")
    got = enable_compile_cache(d)
    assert got == os.path.abspath(d)
    assert jax.config.jax_compilation_cache_dir == got

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x

    np.asarray(f(jnp.ones((128, 128), jnp.float32)))
    assert len(os.listdir(d)) >= 1  # executable written


def test_enable_from_env(tmp_path, monkeypatch):
    monkeypatch.delenv("PLIP_TPU_COMPILE_CACHE", raising=False)
    assert enable_from_env() is None
    d = str(tmp_path / "envcache")
    monkeypatch.setenv("PLIP_TPU_COMPILE_CACHE", d)
    assert enable_from_env() == os.path.abspath(d)
    monkeypatch.setenv("PLIP_TPU_COMPILE_CACHE", "1")
    assert enable_from_env().endswith(os.path.join("plip_tpu", "jax_cache"))
