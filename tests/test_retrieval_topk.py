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
