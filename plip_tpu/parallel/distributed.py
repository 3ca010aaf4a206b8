"""Multi-host initialization — the distributed backend the reference lacks
(SURVEY.md §2.3: scale-out there = independent SLURM jobs + bash loops).

One call per host before any device use:

    from plip_tpu.parallel import distributed
    distributed.initialize()          # env-driven (TPU pods auto-detect)
    mesh = create_mesh(dp=..., tp=...)  # global mesh over all hosts' devices

On TPU pods ``jax.distributed.initialize()`` self-configures from the
metadata server; elsewhere pass coordinator_address/num_processes/process_id
explicitly. Collectives ride ICI within a slice and DCN across slices purely
from sharding annotations — no NCCL/MPI-style code anywhere.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Idempotent jax.distributed.initialize. Returns True if multi-process.

    Safe to call in single-process runs (no-ops when there is nothing to
    coordinate and no env configuration is present).
    """
    # NB: never probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() hard-fails ("must be
    # called before any JAX calls"). is_initialized() is side-effect free.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    kwargs = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
        return jax.process_count() > 1
    except (RuntimeError, ValueError):
        if kwargs:
            raise  # caller explicitly asked for multi-process: surface it
        # env-driven probe on a single-process run: nothing to coordinate
        return False


def agree_max_int(value: int) -> int:
    """Cross-process max-agreement on a small host integer.

    The coordination primitive behind the tuner's coordinated auto-accum
    (train/clip_tuner.py): every process proposes a value, everyone receives
    the max, so all processes take identical decisions (e.g. rebuild the
    train step at the same accumulation factor) before any of them re-enters
    a collective program. Single-process: identity, no device work.

    Uses ``multihost_utils.process_allgather`` — a tiny replicated-scalar
    all_gather riding the same ICI/DCN transport as training collectives,
    so it needs no side channel. Every process MUST call this the same
    number of times (it is itself a collective).
    """
    if jax.process_count() == 1:
        return int(value)
    import numpy as np
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.int32(value))
    return int(np.max(vals))


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-ordered batch (per-host sharding)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
