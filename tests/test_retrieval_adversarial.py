"""Adversarial retrieval-recall validation (VERDICT r4 #4).

The r4 recall/parity guarantees were measured on iid Gaussian corpora;
production pathology-tile embeddings are clustered near-duplicates with
near-tie score margins — exactly where bucketed approx reductions and int8
quantization lose candidates. These tests pin the exact paths and the
``auto_oversample`` probe/raise/fallback on corpora built to break them:
cluster blobs, low-rank subspaces, duplicate-heavy indexes, and a
margin-crusher whose score gaps sit far below int8 noise (which provably
defeats the raw 4×k oversample, asserted, and which the probe must catch).

Reference semantics matched: identical ranking to the host argsort of
`/root/reference/plip.py:78-87`.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from plip_tpu.ops import retrieval as R


def _host_exact(q, x, k):
    """Reference ranking: scores + indices by full argsort (stable)."""
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    s = q @ x.T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(s, idx, axis=1)


def _assert_ranking_matches(got_idx, got_val, true_idx, true_val, x, q):
    """Scores must match exactly rank-for-rank; indices must agree except
    within exact score ties (duplicate rows make tie order meaningless)."""
    np.testing.assert_allclose(got_val, true_val, rtol=0, atol=1e-5)
    qn = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # every returned index must actually produce the claimed exact score
    recomputed = np.einsum("qd,qkd->qk", qn, x[got_idx])
    np.testing.assert_allclose(recomputed, got_val, rtol=0, atol=1e-5)


def _clustered(rng, n=8192, d=64, clusters=32, noise=1e-3):
    centers = rng.standard_normal((clusters, d)).astype(np.float32)
    assign = rng.integers(0, clusters, n)
    x = centers[assign] + noise * rng.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32)


def _low_rank(rng, n=8192, d=64, rank=4, noise=1e-4):
    basis = rng.standard_normal((rank, d)).astype(np.float32)
    coef = rng.standard_normal((n, rank)).astype(np.float32)
    return (coef @ basis + noise * rng.standard_normal((n, d))).astype(np.float32)


def _duplicate_heavy(rng, n=8192, d=64, uniques=128):
    u = rng.standard_normal((uniques, d)).astype(np.float32)
    return u[rng.integers(0, uniques, n)].copy()


def _margin_crusher(rng, n=2048, d=64, gap=1e-5):
    """Rows whose true scores to a known query descend in ``gap`` steps —
    far below int8 quantization noise (~1e-2 per score), so the quantized
    ranking is near-random and the true top-k does NOT survive a plain
    4×k candidate margin."""
    q = rng.standard_normal(d).astype(np.float64)
    q /= np.linalg.norm(q)
    orth = rng.standard_normal((n, d))
    orth -= np.outer(orth @ q, q)
    orth /= np.linalg.norm(orth, axis=1, keepdims=True)
    target = 0.9 - gap * np.arange(n)
    x = target[:, None] * q[None, :] + np.sqrt(1 - target**2)[:, None] * orth
    return x.astype(np.float32), q.astype(np.float32)[None, :]


CORPORA = ["clustered", "low_rank", "duplicate_heavy"]


def _corpus(name, rng):
    return {"clustered": _clustered, "low_rank": _low_rank,
            "duplicate_heavy": _duplicate_heavy}[name](rng)


@pytest.mark.parametrize("name", CORPORA)
def test_fp32_exact_merge_on_adversarial(name):
    rng = np.random.default_rng(0)
    x = _corpus(name, rng)
    q = rng.standard_normal((8, x.shape[1])).astype(np.float32)
    ti, tv = _host_exact(q, x, 10)
    gi, gv = R.cosine_topk(q, x, k=10, normalize="queries", chunk=1024)
    _assert_ranking_matches(gi, gv, ti, tv, x, q)


@pytest.mark.parametrize("name", CORPORA)
def test_int8_rescore_on_adversarial(name):
    rng = np.random.default_rng(1)
    x = _corpus(name, rng)
    q = rng.standard_normal((8, x.shape[1])).astype(np.float32)
    x8, inv = R.quantize_rows(x, normalize=False)
    ti, tv = _host_exact(q, x, 10)
    gi, gv = R.cosine_topk_int8(q, x8, inv, k=10, rescore_vectors=x,
                                chunk=1024)
    _assert_ranking_matches(gi, gv, ti, tv, x, q)


def test_margin_crusher_defeats_plain_oversample():
    """The adversary is real: without the probe, int8 + 4×k rescore loses
    most of the true top-k (score gaps ≪ quantization noise)."""
    rng = np.random.default_rng(2)
    x, q = _margin_crusher(rng)
    x8, inv = R.quantize_rows(x, normalize=False)
    ti, _ = _host_exact(q, x, 10)
    gi, _ = R.cosine_topk_int8(q, x8, inv, k=10, rescore_vectors=x,
                               chunk=1024, auto_oversample=False)
    recall = len(set(gi[0]) & set(ti[0])) / 10.0
    assert recall < 0.9, f"adversary failed to bite (recall={recall})"


def test_margin_crusher_auto_oversample_recovers_exact():
    """With the probe on (default), the same adversarial call must return
    the true ranking (probe trips -> raise -> exact fp32 fallback)."""
    rng = np.random.default_rng(2)
    x, q = _margin_crusher(rng)
    x8, inv = R.quantize_rows(x, normalize=False)
    ti, tv = _host_exact(q, x, 10)
    gi, gv = R.cosine_topk_int8(q, x8, inv, k=10, rescore_vectors=x,
                                chunk=1024)
    np.testing.assert_array_equal(gi, ti)
    np.testing.assert_allclose(gv, tv, rtol=0, atol=1e-6)


def test_probe_passes_single_stream_on_benign(monkeypatch):
    """Well-separated corpora must NOT pay a second stream: count the scan
    invocations through the probe path."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4096, 64)).astype(np.float32)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    x8, inv = R.quantize_rows(x, normalize=False)

    calls = []
    orig = R._topk_int8_jit

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(R, "_topk_int8_jit", counting)
    ti, tv = _host_exact(q, x, 10)
    gi, gv = R.cosine_topk_int8(q, x8, inv, k=10, rescore_vectors=x,
                                chunk=1024)
    assert len(calls) == 1, "benign corpus re-streamed"
    _assert_ranking_matches(gi, gv, ti, tv, x, q)


def test_int8_mesh_adversarial_clustered():
    """dp-mesh int8 path + probe on a clustered corpus == host exact."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from plip_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(4)
    x = _clustered(rng, n=4096, d=64, clusters=16, noise=1e-3)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    mesh = create_mesh(dp=8, tp=1)
    x8, inv = R.quantize_rows(x, normalize=False)
    ti, tv = _host_exact(q, x, 10)
    gi, gv = R.cosine_topk_int8(q, x8, inv, k=10, rescore_vectors=x,
                                chunk=512, mesh=mesh)
    _assert_ranking_matches(gi, gv, ti, tv, x, q)


def test_duplicate_ties_any_valid_winner_set():
    """Duplicate-heavy corpora: k duplicates of the best row tie exactly —
    whatever indices come back must all score as the true winners."""
    rng = np.random.default_rng(5)
    x = _duplicate_heavy(rng, n=4096, d=64, uniques=64)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    x8, inv = R.quantize_rows(x, normalize=False)
    ti, tv = _host_exact(q, x, 25)
    gi, gv = R.cosine_topk_int8(q, x8, inv, k=25, rescore_vectors=x,
                                chunk=1024)
    _assert_ranking_matches(gi, gv, ti, tv, x, q)
