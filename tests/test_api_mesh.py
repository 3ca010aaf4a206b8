"""Mesh-sharded inference through the public API + loader robustness."""

import numpy as np
import pytest

import jax

from plip_tpu.api import PLIP
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig
from plip_tpu.parallel.mesh import create_mesh
from plip_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = CLIPConfig(
        vision=VisionConfig(width=128, layers=2, heads=2, image_size=224, patch_size=32),
        text=TextConfig(width=128, layers=2, heads=2, vocab_size=49408, context_length=77),
        embed_dim=16,
    )
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path_factory.mktemp("m") / "m.npz")
    save_checkpoint(p, params, cfg)
    return p


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    paths = []
    for i in range(8):
        p = str(d / f"{i}.png")
        Image.fromarray(rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    return paths


def test_mesh_inference_matches_plain(ckpt, images):
    plain = PLIP(ckpt)
    mesh = create_mesh(dp=4, tp=2)
    sharded = PLIP(ckpt, mesh=mesh)
    a = plain.encode_images(images, batch_size=8)
    b = sharded.encode_images(images, batch_size=8)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
    at = plain.encode_text(["benign", "malignant"], batch_size=2)
    bt = sharded.encode_text(["benign", "malignant"], batch_size=2)
    np.testing.assert_allclose(at, bt, rtol=2e-4, atol=2e-4)


def test_loader_zero_on_error(ckpt, images, tmp_path):
    from plip_tpu.data.datasets import ImageDataset
    from plip_tpu.data.loader import PrefetchLoader

    bad = str(tmp_path / "missing.png")
    ds = ImageDataset(images[:3] + [bad], on_error="zero")
    loader = PrefetchLoader(ds, batch_size=2, device_put=False,
                            collate=lambda items, bs: list(items))
    batches = list(loader)
    assert len(batches) == 2
    assert ds.failed_indices == [3]
    last_batch, n = batches[-1]
    assert (last_batch[1] == 0).all()  # zero tile substituted

    # default mode still raises
    ds2 = ImageDataset([bad])
    with pytest.raises(Exception):
        list(PrefetchLoader(ds2, batch_size=1, device_put=False))


def test_mesh_int8_retrieval_matches_host(ckpt, images):
    """int8 index + dp×tp mesh through the public API: device retrieval
    (dp-sharded int8 scan + ICI gather + exact host rescore) returns the
    host backend's reference-semantics ranking."""
    mesh = create_mesh(dp=4, tp=2)
    m = PLIP(ckpt, mesh=mesh)
    m.build_image_index(images, batch_size=8, quantize="int8")
    host = m.retrieval(["tumor", "benign gland"], top_k=4, backend="host")
    dev = m.retrieval(["tumor", "benign gland"], top_k=4, backend="device")
    np.testing.assert_array_equal(np.asarray(host), np.asarray(dev))
