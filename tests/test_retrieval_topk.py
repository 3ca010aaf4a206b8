"""Device-side streaming top-k retrieval (ops/retrieval.py): parity with
the host argsort path, chunk-padding edges, reference normalize semantics,
and the dp-sharded mesh variant on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from plip_tpu.ops.retrieval import cosine_topk


def _host_topk(q, x, k, normalize):
    if normalize in (True, "both", "queries"):
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    if normalize in (True, "both"):
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    scores = q @ x.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    return idx, np.take_along_axis(scores, idx, axis=1)


@pytest.mark.parametrize("normalize", [True, "queries", False])
@pytest.mark.parametrize("n,chunk", [(1000, 128), (64, 64), (37, 512)])
def test_streaming_topk_matches_host(normalize, n, chunk):
    rng = np.random.default_rng(5)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    x = rng.standard_normal((n, 32)).astype(np.float32)
    k = 7 if n >= 7 else n
    idx, vals = cosine_topk(q, x, k=k, normalize=normalize, chunk=chunk)
    ref_idx, ref_vals = _host_topk(q, x, k, normalize)
    # continuous random scores: tie-free, so indices match exactly
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)


def test_streaming_topk_mesh_matches_single():
    """dp-sharded index (8 virtual devices, N % dp != 0, negative scores)
    returns the same global winners as the single-device stream."""
    from plip_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh(dp=8, tp=1)
    rng = np.random.default_rng(9)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    x = rng.standard_normal((203, 16)).astype(np.float32)
    idx_m, vals_m = cosine_topk(q, x, k=9, chunk=32, mesh=mesh)
    idx_s, vals_s = cosine_topk(q, x, k=9, chunk=32)
    np.testing.assert_array_equal(idx_m, idx_s)
    np.testing.assert_allclose(vals_m, vals_s, rtol=1e-5, atol=1e-5)


def test_api_retrieval_device_backend(tmp_path):
    """PLIP.retrieval(backend='device') ranks identically to the host
    (reference-semantics) path."""
    from PIL import Image

    from plip_tpu.api import PLIP

    rng = np.random.default_rng(2)
    paths = []
    for i in range(6):
        p = str(tmp_path / f"t{i}.png")
        Image.fromarray(
            rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    m = PLIP(f"random:ViT-B/32")
    m.build_image_index(paths, batch_size=6)
    host = m.retrieval(["tumor tissue", "benign gland"], top_k=3,
                       backend="host")
    dev = m.retrieval(["tumor tissue", "benign gland"], top_k=3,
                      backend="device")
    np.testing.assert_array_equal(np.asarray(host), np.asarray(dev))


def test_empty_corpus_matches_host_shape():
    """n=0 returns [Q, 0] like the host path instead of crashing."""
    q = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
    idx, vals = cosine_topk(q, np.zeros((0, 8), np.float32), k=5)
    assert idx.shape == (3, 0) and vals.shape == (3, 0)


def test_api_retrieval_bad_backend(tmp_path):
    from PIL import Image

    from plip_tpu.api import PLIP

    rng = np.random.default_rng(1)
    p = str(tmp_path / "a.png")
    Image.fromarray(rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)).save(p)
    m = PLIP("random:ViT-B/32")
    m.build_image_index([p], batch_size=1)
    with pytest.raises(ValueError, match="unknown retrieval backend"):
        m.retrieval(["x"], top_k=1, backend="devise")


# ---- int8 quantized index (ops.retrieval.quantize_rows / cosine_topk_int8)


def test_quantize_rows_roundtrip_error_bound():
    """Per-row symmetric int8: |x - q*inv| <= inv/2 = max|row|/254 per
    component, for raw and normalized rows alike."""
    from plip_tpu.ops.retrieval import quantize_rows

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((64, 48)) * rng.gamma(2.0, 2.0, (64, 1))
         ).astype(np.float32)
    for normalize in (False, True):
        q8, inv = quantize_rows(x, normalize=normalize)
        xr = x if not normalize else x / np.linalg.norm(
            x, axis=-1, keepdims=True)
        assert q8.dtype == np.int8 and inv.dtype == np.float32
        err = np.abs(q8.astype(np.float32) * inv[:, None] - xr)
        assert np.all(err <= inv[:, None] * 0.5 + 1e-7)


def test_int8_topk_with_rescore_is_exact():
    """Quantized scan + 4x-oversampled exact host rescore reproduces the
    fp32 ranking AND scores on well-separated random data (raw-space
    reference semantics: rows unnormalized, queries normalized)."""
    from plip_tpu.ops.retrieval import cosine_topk_int8, quantize_rows

    rng = np.random.default_rng(3)
    q = rng.standard_normal((6, 64)).astype(np.float32)
    x = (rng.standard_normal((700, 64)) * rng.gamma(2.0, 1.0, (700, 1))
         ).astype(np.float32)
    q8, inv = quantize_rows(x, normalize=False)
    idx, vals = cosine_topk_int8(q, q8, inv, k=10, chunk=128,
                                 rescore_vectors=x)
    ref_idx, ref_vals = _host_topk(q, x, 10, normalize="queries")
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)


def test_int8_topk_unrescored_recall():
    """Without rescoring the quantized ranking's top-k overlaps the exact
    top-k almost completely (it is an estimate, not a contract)."""
    from plip_tpu.ops.retrieval import cosine_topk_int8, quantize_rows

    rng = np.random.default_rng(7)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    x = rng.standard_normal((512, 64)).astype(np.float32)
    q8, inv = quantize_rows(x, normalize=False)
    idx, _ = cosine_topk_int8(q, q8, inv, k=10, chunk=128)
    ref_idx, _ = _host_topk(q, x, 10, normalize="queries")
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 10 for i in range(len(q))
    ])
    assert recall >= 0.9, recall


def test_int8_topk_edges():
    """k > n clamps; n smaller than chunk pads; empty corpus -> [Q, 0]."""
    from plip_tpu.ops.retrieval import cosine_topk_int8, quantize_rows

    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    x = rng.standard_normal((5, 16)).astype(np.float32)
    q8, inv = quantize_rows(x, normalize=False)
    idx, vals = cosine_topk_int8(q, q8, inv, k=9, chunk=64,
                                 rescore_vectors=x)
    assert idx.shape == (2, 5)
    ref_idx, _ = _host_topk(q, x, 5, normalize="queries")
    np.testing.assert_array_equal(idx, ref_idx)
    e_idx, e_vals = cosine_topk_int8(
        q, np.zeros((0, 16), np.int8), np.zeros((0,), np.float32), k=3)
    assert e_idx.shape == (2, 0) and e_vals.shape == (2, 0)


def test_api_retrieval_int8_index(tmp_path):
    """build_image_index(quantize='int8') + device backend returns the host
    (reference-semantics) ranking via the exact rescore."""
    from PIL import Image

    from plip_tpu.api import PLIP

    rng = np.random.default_rng(4)
    paths = []
    for i in range(8):
        p = str(tmp_path / f"q{i}.png")
        Image.fromarray(
            rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    m = PLIP("random:ViT-B/32")
    m.build_image_index(paths, batch_size=8, quantize="int8")
    host = m.retrieval(["tumor tissue", "benign gland"], top_k=4,
                       backend="host")
    dev = m.retrieval(["tumor tissue", "benign gland"], top_k=4,
                      backend="device")
    np.testing.assert_array_equal(np.asarray(host), np.asarray(dev))


def test_approx_merge_paths():
    """merge="approx" compiles and returns well-formed rankings in both the
    fp32 and int8 scans; with the exact rescore the int8+approx path's final
    top-k equals the exact host ranking (the shipped "auto" config). On CPU
    approx_max_k lowers near-exactly; the TPU recall ablation lives in
    experiments/bench_topk_merge.py (measured candidate recall 1.000)."""
    from plip_tpu.ops.retrieval import (
        cosine_topk,
        cosine_topk_int8,
        quantize_rows,
    )

    rng = np.random.default_rng(21)
    q = rng.standard_normal((6, 64)).astype(np.float32)
    x = rng.standard_normal((900, 64)).astype(np.float32)
    ref_idx, _ = _host_topk(q, x, 10, normalize="queries")

    idx_a, vals_a = cosine_topk(q, x, k=10, normalize="queries", chunk=128,
                                merge="approx")
    assert idx_a.shape == (6, 10)
    assert np.all(np.diff(vals_a, axis=1) <= 1e-6)  # descending
    recall = np.mean([
        len(set(idx_a[i]) & set(ref_idx[i])) / 10 for i in range(6)])
    assert recall >= 0.9, recall

    q8, inv = quantize_rows(x, normalize=False)
    idx_q, _ = cosine_topk_int8(q, q8, inv, k=10, chunk=128,
                                rescore_vectors=x)  # merge="auto" -> approx
    np.testing.assert_array_equal(idx_q, ref_idx)

    with pytest.raises(ValueError, match="unknown merge"):
        cosine_topk(q, x, k=10, merge="fast")
    with pytest.raises(ValueError, match="unknown merge"):
        cosine_topk_int8(q, q8, inv, k=10, merge="fast")


def test_approx_merge_mesh_matches_single():
    """merge="approx" threads through the dp-sharded mesh stream."""
    from plip_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh(dp=8, tp=1)
    rng = np.random.default_rng(13)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    x = rng.standard_normal((203, 16)).astype(np.float32)
    idx_m, _ = cosine_topk(q, x, k=9, chunk=32, mesh=mesh, merge="approx")
    idx_s, _ = cosine_topk(q, x, k=9, chunk=32, merge="approx")
    np.testing.assert_array_equal(idx_m, idx_s)


def test_int8_mesh_matches_single_and_host():
    """int8 candidates dp-sharded over the 8-device CPU mesh + exact host
    rescore give the same final ranking as the single-device int8 path and
    the exact host argsort (N % dp != 0, pre-padded n_valid variant too)."""
    from plip_tpu.parallel.mesh import create_mesh
    from plip_tpu.ops.retrieval import cosine_topk_int8, quantize_rows

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh(dp=8, tp=1)
    rng = np.random.default_rng(17)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    x = rng.standard_normal((203, 32)).astype(np.float32)
    q8, inv = quantize_rows(x, normalize=False)
    idx_m, vals_m = cosine_topk_int8(q, q8, inv, k=7, chunk=32,
                                     rescore_vectors=x, mesh=mesh)
    idx_s, vals_s = cosine_topk_int8(q, q8, inv, k=7, chunk=32,
                                     rescore_vectors=x)
    ref_idx, _ = _host_topk(q, x, 7, normalize="queries")
    np.testing.assert_array_equal(idx_m, idx_s)
    np.testing.assert_array_equal(idx_m, ref_idx)
    np.testing.assert_allclose(vals_m, vals_s, rtol=1e-5, atol=1e-6)

    # pre-padded index + n_valid (the api.py cached-index calling pattern)
    pad = 256 - 203
    q8p = np.pad(q8, ((0, pad), (0, 0)))
    invp = np.pad(inv, (0, pad))
    idx_p, _ = cosine_topk_int8(q, q8p, invp, k=7, chunk=32,
                                rescore_vectors=x, mesh=mesh, n_valid=203)
    np.testing.assert_array_equal(idx_p, ref_idx)


def test_set_image_index_precomputed(tmp_path):
    """set_image_index installs precomputed embeddings (the WSI flow) and
    honors quantize='int8'; device ranking equals the host backend."""
    from plip_tpu.api import PLIP

    m = PLIP("random:ViT-B/32")
    rng = np.random.default_rng(6)
    emb = rng.standard_normal((40, m.cfg.embed_dim)).astype(np.float32)
    m.set_image_index(emb, quantize="int8")
    host = m.retrieval(["tumor"], top_k=5, backend="host")
    dev = m.retrieval(["tumor"], top_k=5, backend="device")
    np.testing.assert_array_equal(np.asarray(host), np.asarray(dev))
    with pytest.raises(ValueError, match="unknown quantize"):
        m.set_image_index(emb, quantize="fp8")
