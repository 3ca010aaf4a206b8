"""End-to-end datagen driver (prepare_all) and ViT classifier coverage."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pd = pytest.importorskip("pandas")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_prepare_all_with_wsss_only(tmp_path):
    """prepare_all over a raw tree where only WSSS4LUAD exists: other datasets
    skip with a notice, WSSS gets resized tiles + train/test CSVs."""
    from plip_tpu.datagen.prepare_dataset_to_csv import prepare_all

    raw = tmp_path / "raw"
    d = raw / "data_validation" / "WSSS4LUAD" / "1.training" / "1.training"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, cls in enumerate(["[1, 0, 0]", "[0, 1, 0]", "[1, 1, 0]", "[0, 0, 1]"]):
        arr = rng.integers(0, 256, (100, 160, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}_{cls}.png")

    img_out = str(tmp_path / "imgs")
    csv_out = str(tmp_path / "csvs")
    written = prepare_all(str(raw), img_out, csv_out, seed=1, train_ratio=0.5,
                          nprocs=2)
    assert written == ["WSSS4LUAD_binary"]
    train = pd.read_csv(os.path.join(csv_out, "WSSS4LUAD_binary_train.csv"),
                        index_col=0)
    test = pd.read_csv(os.path.join(csv_out, "WSSS4LUAD_binary_test.csv"),
                       index_col=0)
    assert len(train) + len(test) == 4
    for p in list(train["image"]) + list(test["image"]):
        assert np.asarray(Image.open(p)).shape == (224, 224, 3)
    assert train["text_style_4"].str.startswith("An H&E image patch of").all()


def test_vit_classifier_tiny():
    from plip_tpu.models import vit as jvit
    from plip_tpu.models.config import VisionConfig

    jvit.ARCHS["vit_tiny_test"] = VisionConfig(
        width=64, layers=2, heads=2, image_size=32, patch_size=16
    )
    params = jvit.init_params(jax.random.PRNGKey(0), "vit_tiny_test", num_classes=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    logits = jvit.forward(params, x, "vit_tiny_test")
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()
    # gradient flows end to end
    g = jax.grad(lambda p: jnp.sum(jvit.forward(p, x, "vit_tiny_test")))(params)
    assert np.isfinite(np.asarray(g["head"]["kernel"])).all()
