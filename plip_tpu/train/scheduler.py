"""LR schedules. Exact rebuild of the reference's OpenCLIP-derived cosine
warmup schedule (`/root/reference/reproducibility/embedders/scheduler.py:9-28`)
as a pure optax-compatible schedule function (no optimizer mutation — JAX
optimizers are functional)."""

from __future__ import annotations

import jax.numpy as jnp


def cosine_lr(base_lr: float, warmup_length: int, steps: int):
    """schedule(step) -> lr.

    warmup: ``base_lr * (step + 1) / warmup_length`` (scheduler.py:13-14)
    then:   ``0.5 * (1 + cos(pi * e / es)) * base_lr`` with
            ``e = step - warmup``, ``es = steps - warmup`` (scheduler.py:21-24)
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / warmup_length
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, warm, cos)

    return schedule
