"""Retrieval scan merge-cost experiment (PERF.md r4 int8 table follow-up).

At Q=64 the streaming top-k is merge-bound, not byte-bound: each chunk pays
an exact `lax.top_k` (sort-lowered) over [Q, k+chunk]. Candidate fix: the
TPU-native `lax.approx_max_k` per chunk (bucketed partial reduction,
~10x cheaper than sort) followed by an exact [Q, 2m] merge with the carry.
The int8 path already rescores candidates exactly on the host, so a ~0.95
per-chunk recall compounds to a high end-to-end recall for the oversampled
candidate set.

The approx variants call the SHIPPED scans with merge="approx" (the local
re-implementations this file first measured were removed once the merge
shipped — same body via _merge_candidates, so the numbers carry over).

Variants (one process, interleaved):
  f32-exact / f32-approx   : _chunk_topk_scan vs approx-merge fp32
  i8-exact  / i8-approx    : int8 scan, exact vs approx merge
measured at N=1M, Q in {1, 64}, k=40 (=4x10 oversample, what rescore uses).
"""

import time

from _harness import setup, sync, interleave

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.ops.retrieval import _chunk_topk_scan, _chunk_topk_scan_int8

D, CHUNK = 512, 8192
N = 1048576
K = 40


@jax.jit
def _dev_quantize(x):
    amax = jnp.maximum(jnp.abs(x).max(axis=-1), 1e-12)
    q = jnp.clip(jnp.rint(x * (127.0 / amax)[:, None]), -127, 127
                 ).astype(jnp.int8)
    return q, (amax / 127.0).astype(jnp.float32)


def chained(scan_call, n_iter):
    def run(*args):
        def body(c, _):
            vals, _ = scan_call(c, *args)
            return jnp.sum(vals) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=int(n_iter))
        return c
    return jax.jit(run)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    x8, inv = _dev_quantize(x)
    for Q in (1, 64):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((Q, D)).astype(np.float32)
        qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
        qa = np.abs(qn).max(axis=-1)
        q8 = np.clip(np.rint(qn * (127.0 / qa)[:, None]), -127, 127
                     ).astype(np.int8)
        qiv = (qa / 127.0).astype(np.float32)
        qd, q8d, qivd = jnp.asarray(qn), jnp.asarray(q8), jnp.asarray(qiv)

        iters = 8
        # arrays passed as jit ARGS (closing over them would bake the 2 GB
        # index into the program as a constant — mlir capture warning)
        runners = {
            "f32-exact": (chained(
                lambda c, qv, xv: _chunk_topk_scan(
                    qv + c * 1e-20, xv, K, CHUNK, jnp.int32(N)), iters),
                (qd, x)),
            "f32-approx": (chained(
                lambda c, qv, xv: _chunk_topk_scan(
                    qv + c * 1e-20, xv, K, CHUNK, jnp.int32(N),
                    merge="approx"), iters),
                (qd, x)),
            "i8-exact": (chained(
                lambda c, qi, qv, xv, iv: _chunk_topk_scan_int8(
                    qi, qv + c * 1e-20, xv, iv, K, CHUNK, jnp.int32(N)),
                iters), (q8d, qivd, x8, inv)),
            "i8-approx": (chained(
                lambda c, qi, qv, xv, iv: _chunk_topk_scan_int8(
                    qi, qv + c * 1e-20, xv, iv, K, CHUNK, jnp.int32(N),
                    merge="approx"), iters), (q8d, qivd, x8, inv)),
        }
        wrapped = {
            name: (lambda f=fn, a=args: sync(f(*a)))
            for name, (fn, args) in runners.items()
        }
        best, _ = interleave(wrapped, rounds=3)
        line = "  ".join(f"{n} {t / iters * 1e3:6.2f}" for n, t in best.items())
        print(f"N={N} Q={Q:>3} k={K} ms/call: {line}", flush=True)

    # candidate recall of the approx int8 scan vs the exact int8 scan
    # (what the host rescore actually consumes), Q=64
    va, ia = _chunk_topk_scan_int8(q8d, qivd, x8, inv, K, CHUNK,
                                   jnp.int32(N), merge="approx")
    ve, ie = _chunk_topk_scan_int8(q8d, qivd, x8, inv, K, CHUNK, jnp.int32(N))
    ia, ie = np.asarray(ia), np.asarray(ie)
    rec = np.mean([len(set(ia[r]) & set(ie[r])) / K for r in range(ia.shape[0])])
    # and top-10-specifically: do the true (exact-scan) top 10 survive?
    rec10 = np.mean([
        len(set(ia[r]) & set(ie[r][:10])) / 10 for r in range(ia.shape[0])])
    print(f"approx candidate recall@{K}: {rec:.4f}; exact-top10 kept: "
          f"{rec10:.4f}", flush=True)


if __name__ == "__main__":
    main()
