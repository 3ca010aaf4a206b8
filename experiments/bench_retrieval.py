"""Benchmark device streaming top-k vs host argsort retrieval (VERDICT r3 #3).

Measures, at D=512 / k=10 (the PLIP retrieval shape, reference
plip.py:78-87):

- device: ops.retrieval streaming scan top-k, index device-resident
  (generated ON device — H2D through this rig's 42 MB/s relay would
  otherwise dominate and is a one-time index-build cost in the API anyway),
  timed by chaining iterations inside one jit (axon: block_until_ready is
  a no-op). Also reports one-shot wall latency incl. the ~28 ms tunnel RTT.
- host: the exact api._nearest_neighbours path (normalize queries, full
  [Q, N] matmul, argsort). NOTE this rig has ONE core; a real host is
  ~4-8x faster on the matmul but numpy argsort is single-threaded anyway.

Output: table over N x Q + the measured crossover for the api.py auto-gate.
"""

import sys
import time

from _harness import setup, sync

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.ops.retrieval import _chunk_topk_scan

D, K, CHUNK = 512, 10, 8192


def bench_device(N, Q, iters):
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.float32)
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def run(qv, xv, n_iter):
        def body(c, _):
            vals, _ = _chunk_topk_scan(qv + c * 1e-20, xv, K, CHUNK,
                                       jnp.int32(N))
            return jnp.sum(vals) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None,
                            length=int(n_iter))
        return c

    runj = jax.jit(run, static_argnames=("n_iter",))
    sync(runj(qn, x, 1))                     # compile + warm
    t0 = time.perf_counter()
    sync(runj(qn, x, 1))
    oneshot = time.perf_counter() - t0       # incl. tunnel RTT
    sync(runj(qn, x, iters))                 # compile the chained shape
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(runj(qn, x, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    del x
    return best, oneshot


def bench_host(N, Q, reps):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sim = qn @ x.T
        idx = sim.argsort()[:, -K:][:, ::-1]
        idx.sum()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ns = [16384, 65536, 262144, 1048576]
    if "--quick" in sys.argv:
        ns = ns[:2]
    print(f"D={D} k={K} chunk={CHUNK}; device=streaming scan (chained, "
          "RTT-free) | oneshot incl RTT | host=matmul+argsort (1 core)",
          flush=True)
    rows = []
    for N in ns:
        for Q in (1, 64):
            iters = max(3, min(50, (1 << 21) // (N // 1024)))
            dev, oneshot = bench_device(N, Q, iters)
            reps = 3 if N <= 262144 else 2
            host = bench_host(N, Q, reps)
            rows.append((N, Q, dev, oneshot, host))
            print(f"N={N:>8} Q={Q:>3}: device {dev*1e3:8.2f} ms "
                  f"(oneshot {oneshot*1e3:7.1f})   host {host*1e3:9.1f} ms "
                  f"  speedup {host/dev:8.1f}x (vs oneshot "
                  f"{host/oneshot:6.1f}x)", flush=True)
    # crossover vs the one-shot number (the user-visible latency on this
    # rig: a single retrieval() call pays one RTT)
    cross = None
    for N, Q, dev, oneshot, host in rows:
        if host > oneshot and cross is None:
            cross = N
    print(f"\ncrossover (host slower than device one-shot): N >= {cross}")


if __name__ == "__main__":
    main()
