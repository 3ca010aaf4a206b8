"""Persistent XLA compilation cache (VERDICT r2 #3).

The flat block-diagonal backward kernels take ~10 min of Mosaic compile per
shape on the axon (remote-compile tunnel) backend — per PROCESS, every time,
without a persistent cache. Measured on this rig: a fresh process compiling
the b32 ViT-B/32 encode path takes ~180 s cold and ~seconds warm once
``jax_compilation_cache_dir`` points at a populated cache (cache hits are
confirmed in `jax._src.compiler` debug logs; see
experiments/try_compile_cache.py for the probe).

No reference counterpart (torch eager has no compile step); this is
operability work the TPU design needs.

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


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; safe to call before or after backend init (the config flags
    only take effect at the next compile). Min-compile-time is dropped to 0
    so even small executables (the many tiny jits around the towers) hit on
    the second process — on the remote-compile tunnel every round trip
    counts.
    """
    import jax

    path = os.path.abspath(cache_dir or _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def enable_from_env() -> Optional[str]:
    """Enable the cache iff ``PLIP_TPU_COMPILE_CACHE`` is set.

    Value ``1``/``true`` selects the default location; anything else is the
    cache directory itself.
    """
    val = os.environ.get("PLIP_TPU_COMPILE_CACHE", "")
    if not val:
        return None
    if val.lower() in ("1", "true", "yes"):
        return enable_compile_cache()
    return enable_compile_cache(val)
