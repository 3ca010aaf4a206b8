"""Persistent XLA compilation cache (VERDICT r2 #3; CPU gate r5).

The flat block-diagonal backward kernels take ~10 min of Mosaic compile per
shape on the axon (remote-compile tunnel) backend — per PROCESS, every time,
without a persistent cache. Measured on this rig: a fresh process compiling
the b32 ViT-B/32 encode path takes ~180 s cold and ~seconds warm once
``jax_compilation_cache_dir`` points at a populated cache (cache hits are
confirmed in `jax._src.compiler` debug logs; see
experiments/try_compile_cache.py for the probe).

No reference counterpart (torch eager has no compile step); this is
operability work the TPU design needs.

**CPU gate (round-5 SIGABRT root cause).** On the XLA:CPU backend the
persistent cache round-trips executables through PjRt AOT serialization.
Deserialization on this host fails the target-machine-feature check
(``cpu_aot_loader.cc: Target machine feature +prefer-no-scatter is not
supported on the host machine``) and a deserialized MULTI-DEVICE executable
then stalls one collective participant: the XLA rendezvous watchdog
(``rendezvous.cc: Termination timeout ... Exiting to ensure a consistent
program state``) CHECK-fails after 40 s and SIGABRTs the whole process.
Reproduced with a brand-new empty cache dir + an 8-virtual-device mesh
program re-traced by a fresh jit in the same process (the cache HIT takes
the broken AOT-load path; the initial MISS is fine). The cache's entire
value is the slow remote-TPU compile, so ``enable_compile_cache`` is now a
documented no-op when the default backend is ``cpu`` unless ``force=True``
(single-device CPU entries deserialize with the same logged feature
mismatch but have executed correctly; multi-device ones abort — do not
force on a CPU mesh). Regression: tests/test_compile_cache.py pins the gate
around mesh collectives, and tests/test_orbax_ckpt.py's mesh-resume test
runs with the cache enabled from env.

Usage:

    from plip_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()            # ~/.cache/plip_tpu/jax_cache
    enable_compile_cache("/fast/dir") # explicit location

or set ``PLIP_TPU_COMPILE_CACHE=/dir`` (``1`` for the default location) —
`bench.py` and the CLI scripts call ``enable_from_env()`` at startup.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.join(
    os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
    "plip_tpu",
    "jax_cache",
)

# jax.config defaults, restored by disable_compile_cache().
_OFF = {
    "jax_compilation_cache_dir": None,
    "jax_persistent_cache_min_compile_time_secs": 1.0,
    "jax_persistent_cache_min_entry_size_bytes": 0,
}


def enable_compile_cache(
    cache_dir: Optional[str] = None, *, force: bool = False
) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent. Min-compile-time is dropped to 0 so even small executables
    (the many tiny jits around the towers) hit on the second process — on
    the remote-compile tunnel every round trip counts.

    Returns the cache path, or ``None`` when gated off: on the ``cpu``
    backend the persistent cache's AOT executable deserialization is broken
    on this host (multi-device programs SIGABRT via the collective
    rendezvous watchdog — see module docstring). ``force=True`` bypasses the
    gate for single-device CPU testing only.

    Note this initializes the JAX backend (to identify it); call after any
    ``jax.config.update("jax_platforms", ...)``.
    """
    import jax

    if not force and jax.default_backend() == "cpu":
        return None
    path = os.path.abspath(cache_dir or _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def disable_compile_cache() -> None:
    """Restore JAX's persistent-cache config to its defaults (cache off).

    Used by tests to guarantee an ``enable_compile_cache`` call never leaks
    global config into later compiles (the round-4 full-suite SIGABRT was
    exactly such a leak composing with a mesh resume).

    Resetting ``jax_compilation_cache_dir`` alone is NOT enough:
    ``jax._src.compilation_cache.is_cache_used`` LATCHES ``_cache_used``
    after the first cached compile and keeps the initialized ``_cache``
    object (with its original path) for the process lifetime — compiles
    after a config reset still round-trip the cache. ``reset_cache()`` is
    the pristine teardown.
    """
    import jax
    from jax._src import compilation_cache

    for name, default in _OFF.items():
        jax.config.update(name, default)
    compilation_cache.reset_cache()


def enable_from_env() -> Optional[str]:
    """Enable the cache iff ``PLIP_TPU_COMPILE_CACHE`` is set.

    Value ``1``/``true`` selects the default location; anything else is the
    cache directory itself. Returns None when unset OR when gated off on
    the cpu backend (see ``enable_compile_cache``).
    """
    val = os.environ.get("PLIP_TPU_COMPILE_CACHE", "")
    if not val:
        return None
    if val.lower() in ("1", "true", "yes"):
        return enable_compile_cache()
    return enable_compile_cache(val)
