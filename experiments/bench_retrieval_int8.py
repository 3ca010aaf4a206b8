"""int8 vs fp32 device streaming top-k (ops.retrieval.cosine_topk_int8).

The fp32 scan is HBM-bandwidth-bound (PERF.md r4 table: N=1M Q=64 in
8.7 ms ≈ reading the 2 GB index at ~240 GB/s effective). The int8 index is
4× smaller, so the expectation is ~2-4× on large N; this measures it, plus
ranking parity after the exact host rescore. "int8" here is the SHIPPED
rescoring config: the scan keeps 4×k oversampled candidates with the
approx_max_k chunk merge (see bench_topk_merge.py for the merge ablation);
"f32" is the default exact device path at k.

Indexes are generated AND quantized on device (H2D through this rig's
42 MB/s relay would otherwise dominate setup; quantization is a one-time
index-build cost in the API). ``--big`` adds an int8-only N=4M point —
a 2 GB int8 index whose fp32 twin (8 GB) cannot fit v5e HBM at all.

One process, interleaved (CLAUDE.md discipline). RTT-free chained timing.
"""

import sys
import time

from _harness import setup, sync

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.ops.retrieval import (
    _chunk_topk_scan,
    _chunk_topk_scan_int8,
    cosine_topk_int8,
)

D, K, CHUNK = 512, 10, 8192


@jax.jit
def _dev_quantize(x):
    amax = jnp.maximum(jnp.abs(x).max(axis=-1), 1e-12)
    q = jnp.clip(jnp.rint(x * (127.0 / amax)[:, None]), -127, 127
                 ).astype(jnp.int8)
    return q, (amax / 127.0).astype(jnp.float32)


def make_queries(Q):
    rng = np.random.default_rng(1)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    q_amax = np.abs(qn).max(axis=-1)
    q_i8 = np.clip(np.rint(qn * (127.0 / q_amax)[:, None]), -127, 127
                   ).astype(np.int8)
    return qn, q_i8, (q_amax / 127.0).astype(np.float32)


def chained(scan_fn, n_iter):
    def run(*args):
        def body(c, _):
            vals, _ = scan_fn(c, *args)
            return jnp.sum(vals) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=int(n_iter))
        return c
    return jax.jit(run)


def bench(N, Q, iters, with_f32=True):
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    x8, inv = _dev_quantize(x)
    if not with_f32:
        del x
        x = None
    qn, q_i8, q_inv = make_queries(Q)
    qd, q8d, qinvd = jnp.asarray(qn), jnp.asarray(q_i8), jnp.asarray(q_inv)

    jf = chained(
        lambda c, qv, xv: _chunk_topk_scan(qv + c * 1e-20, xv, K, CHUNK,
                                           jnp.int32(N)), iters
    ) if with_f32 else None
    # the SHIPPED rescoring config: scan keeps 4*K oversampled candidates
    # with the approx_max_k chunk merge (cosine_topk_int8 merge="auto")
    ji = chained(
        lambda c, qv, qi, xv, iv: _chunk_topk_scan_int8(
            qv, qi + c * 1e-20, xv, iv, 4 * K, CHUNK, jnp.int32(N),
            merge="approx"), iters
    )

    if with_f32:
        sync(jf(qd, x))
    sync(ji(q8d, qinvd, x8, inv))
    best = {"f32": float("inf"), "i8": float("inf")}
    for _ in range(3):
        if with_f32:
            t0 = time.perf_counter()
            sync(jf(qd, x))
            best["f32"] = min(best["f32"], (time.perf_counter() - t0) / iters)
        t0 = time.perf_counter()
        sync(ji(q8d, qinvd, x8, inv))
        best["i8"] = min(best["i8"], (time.perf_counter() - t0) / iters)

    match = None
    if with_f32 and N <= 262144:
        # ranking parity after the exact host rescore (one D2H of the index)
        xh = np.asarray(x)
        idx, _ = cosine_topk_int8(qn, x8, inv, k=K, chunk=CHUNK,
                                  rescore_vectors=xh)
        ref = (qn @ xh.T).argsort()[:, -K:][:, ::-1]
        match = float(np.mean(idx == ref))
    return best["f32"], best["i8"], match


def main():
    ns = [262144, 1048576]
    if "--quick" in sys.argv:
        ns = [65536]
    print(f"D={D} k={K} chunk={CHUNK}; chained RTT-free ms/call", flush=True)
    for N in ns:
        for Q in (1, 64):
            iters = max(3, min(50, (1 << 21) // (N // 1024)))
            f32, i8, match = bench(N, Q, iters)
            par = f"  top-{K} parity {match:.3f}" if match is not None else ""
            print(f"N={N:>8} Q={Q:>3}: f32 {f32*1e3:7.2f} ms  int8 "
                  f"{i8*1e3:7.2f} ms ({f32/i8:4.2f}x){par}", flush=True)
    if "--big" in sys.argv:
        N = 4 * 1048576
        for Q in (1, 64):
            _, i8, _ = bench(N, Q, iters=3, with_f32=False)
            print(f"N={N:>8} Q={Q:>3}: int8-only {i8*1e3:7.2f} ms "
                  "(fp32 twin = 8 GB, does not fit HBM)", flush=True)


if __name__ == "__main__":
    main()
