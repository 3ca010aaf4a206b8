"""Shared experiment harness (VERDICT r3 #9).

Encodes the measurement discipline learned in rounds 1-3 (CLAUDE.md):

- ONE process per comparison: cross-process variance on the axon tunnel is
  ~8% — variants must be interleaved in a single process (``interleave``).
- ``block_until_ready`` is a NO-OP on axon: timing must chain iterations
  inside one jit (``chain`` / ``chain_train``) and sync with a scalar
  ``float(...)`` fetch (``sync``).
- Train-state benchmarks MUST donate the carried state (L/14's 5.1 GB fp32
  state OOMs otherwise) — ``chain_train`` jits with ``donate_argnums=(0,)``.
- Persistent compile cache on by default (cold Mosaic bwd compiles were
  ~10 min pre-cache).

Usage (see bench_retrieval.py / bench_l14_flash2.py for worked examples)::

    from _harness import setup, interleave, sync, make_clip_batch
    setup()                       # sys.path + compile cache
    runners = {"a": fn_a, "b": fn_b}          # each: () -> scalar-syncable
    best = interleave(runners, rounds=3)      # {"a": seconds, ...}
"""

import functools
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def setup(cache_dir: str = None):
    """sys.path bootstrap + persistent compile cache. Call FIRST."""
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    from plip_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(cache_dir or os.path.join(_REPO, ".jax_cache"))


def sync(x):
    """Force device execution and return the scalar (axon-safe barrier)."""
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def interleave(runners, rounds: int = 3, warmup: int = 1):
    """Round-robin the runner callables; return {name: best_seconds}.

    Each runner must be a zero-arg callable that blocks until its device
    work is done (i.e. ends in ``sync``/``float`` of a device scalar) and
    covers a FIXED amount of work, so times are comparable across rounds.
    Interleaving across ``rounds`` passes absorbs tunnel drift; the min is
    reported (machine noise is one-sided).
    """
    times = {name: [] for name in runners}
    for name, fn in runners.items():  # compile + warm outside the clock
        for _ in range(warmup):
            fn()
    for _ in range(rounds):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    return {name: min(ts) for name, ts in times.items()}, times


def chain(fn, n_iter: int, perturb=None):
    """Build a jitted callable running ``fn`` n_iter times, serialized.

    ``fn(args...) -> array``; iterations are chained by adding
    ``carry * 1e-20`` to the first argument (or via ``perturb(args, carry)``
    returning new args) so XLA cannot hoist or parallelize them. Returns
    ``run(*args) -> float`` which blocks until all iterations executed.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(carry, _):
            if perturb is None:
                # scale in fp32, then cast to the arg's dtype: keeps the
                # benched fn at its real dtype (bf16 + f32 carry would upcast
                # the whole chain to f32 — measured VMEM blowups)
                eps = (carry * 1e-20).astype(args[0].dtype)
                a = (args[0] + eps,) + args[1:]
            else:
                a = perturb(args, carry)
            out = fn(*a)
            return jnp.sum(out).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_iter)
        return c

    return lambda *args: sync(run(*args))


def chain_train(step, n_iter: int):
    """fori_loop n_iter train steps carrying (and donating) the state.

    ``step(state, *batch) -> (state, aux)``. Returns ``run(state, *batch)``
    -> new state; time it between two ``sync(state.params[...])`` fetches.
    NOTE: donation consumes the passed state — keep a fresh copy per timing
    round or re-init.
    """
    import jax

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, *batch):
        def body(_, s):
            s2, _ = step(s, *batch)
            return s2

        return jax.lax.fori_loop(0, n_iter, body, state)

    return run


def make_clip_batch(batch: int, ctx: int = 77, image: int = 224, seed: int = 0):
    """Standard random (px, ids) train batch used across benches."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    px = jnp.asarray(
        rng.standard_normal((batch, image, image, 3)).astype(np.float32))
    ids_np = np.zeros((batch, ctx), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    return px, jnp.asarray(ids_np)
