"""Tests for the reproducibility-harness layers: metrics, eval heads, cache,
results handler, loader, and device-side augmentation."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.eval.linear_probe import LinearProber
from plip_tpu.eval.metrics import eval_metrics, retrieval_metrics
from plip_tpu.eval.retrieval import ImageRetrieval
from plip_tpu.eval.zero_shot import ZeroShotClassifier
from plip_tpu.ops.augment import AugmentConfig, augment_batch
from plip_tpu.utils.results_handler import ResultsHandler


def test_eval_metrics_binary():
    y_true = [0, 1, 1, 0, 1, 0]
    y_pred = [0, 1, 0, 0, 1, 1]
    m = eval_metrics(y_true, y_pred)
    assert m["tp"] == 2 and m["fp"] == 1 and m["tn"] == 2 and m["fn"] == 1
    assert np.isclose(m["Accuracy"], 4 / 6)
    assert np.isclose(m["sensitivity"], 2 / 3)
    assert np.isclose(m["specificity"], 2 / 3)
    assert np.isclose(m["hitrate"], 4 / 6)
    assert m["instances"] == 6
    # AUROC NaN without probabilities (reference behavior)
    assert np.isnan(m["AUC"])


def test_eval_metrics_auc_binary_and_multiclass_nan():
    y = [0, 1, 0, 1]
    proba = [0.1, 0.9, 0.4, 0.6]
    m = eval_metrics(y, y, y_pred_proba=proba)
    assert np.isclose(m["AUC"], 1.0)
    m3 = eval_metrics([0, 1, 2], [0, 1, 2], y_pred_proba=[0.1, 0.5, 0.9])
    assert np.isnan(m3["AUC"])  # 'Multiclass AUC is not currently available.'


def test_eval_metrics_matches_sklearn_reference_loop():
    """Vectorized confusion counts == the reference's python loop."""
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, 200)
    y_pred = rng.integers(0, 2, 200)
    m = eval_metrics(y_true, y_pred)
    tp = fp = tn = fn = 0
    for i in range(len(y_pred)):
        if y_true[i] == y_pred[i] == 1:
            tp += 1
        if y_pred[i] == 1 and y_true[i] != y_pred[i]:
            fp += 1
        if y_true[i] == y_pred[i] == 0:
            tn += 1
        if y_pred[i] == 0 and y_true[i] != y_pred[i]:
            fn += 1
    assert (m["tp"], m["fp"], m["tn"], m["fn"]) == (tp, fp, tn, fn)


def test_retrieval_metrics():
    targets = [0, 20, 2]
    preds = [list(range(50)), list(range(5, 60)), [99] * 50]
    m = retrieval_metrics(targets, preds)
    # q0: 0 in top10 & top50; q1: 20 in top50 ([5..54]) but not top10 ([5..14]);
    # q2: miss
    assert np.isclose(m["p@10"], 1 / 3)
    assert np.isclose(m["p@50"], 2 / 3)


def test_zero_shot_head():
    rng = np.random.default_rng(0)
    txt = rng.standard_normal((3, 8))
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    labels = ["a", "b", "c"]
    img = txt[[0, 1, 2, 0]] + 0.01 * rng.standard_normal((4, 8))
    zs = ZeroShotClassifier()
    train_m, test_m = zs.zero_shot_classification(img, txt, labels, ["a", "b", "c", "a"])
    assert test_m["Accuracy"] == 1.0
    assert test_m["split"] == "test" and train_m["split"] == "train"


def test_retrieval_head_identity():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((60, 16))
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt = img + 0.001 * rng.standard_normal(img.shape)
    ir = ImageRetrieval()
    _, test_m = ir.retrieval(img, txt)
    assert test_m["p@10"] == 1.0
    assert test_m["p@50"] == 1.0


def test_retrieval_head_matches_reference_argsort():
    """Top-50 per query must equal the reference's argsort[-50:][::-1]."""
    rng = np.random.default_rng(2)
    img = rng.standard_normal((120, 8))
    txt = rng.standard_normal((7, 8))
    scores = txt @ img.T
    ref_best = [r.argsort()[-50:][::-1] for r in scores]
    from plip_tpu.eval.metrics import retrieval_metrics as rm

    ir = ImageRetrieval()
    _, ours = ir.retrieval(img, txt)
    theirs = rm(list(range(120)), ref_best)
    assert ours["p@10"] == theirs["p@10"]
    assert ours["p@50"] == theirs["p@50"]


@pytest.mark.parametrize("backend", ["sklearn", "jax"])
def test_linear_probe_separable(backend):
    rng = np.random.default_rng(3)
    n = 200
    x0 = rng.standard_normal((n, 16)) + 2.0
    x1 = rng.standard_normal((n, 16)) - 2.0
    X = np.concatenate([x0, x1])
    y = ["pos"] * n + ["neg"] * n
    prober = LinearProber(alpha=1e-3, seed=7, backend=backend)
    _, (test_m, train_m) = prober.train_and_test(X, y, X, y)
    assert test_m["Accuracy"] > 0.99
    assert test_m["split"] == "test"


def test_cacher_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("PC_CACHE_FOLDER", str(tmp_path))
    from plip_tpu.utils import cacher

    arr = np.arange(12).reshape(3, 4).astype(np.float32)
    assert cacher.cache_hit_or_miss("plipimgkather_test.csv", "/some/backbone.pt") is None
    cacher.cache_numpy_object(arr, "name", "/p")
    np.testing.assert_array_equal(cacher.cache_hit_or_miss("name", "/p"), arr)

    # human-readable layout: {cache}/{dataset}/{model}/{basename}
    cacher.cache_numpy_object_raw_filename(arr, "plipimgkather_test.csv", "/x/bb.pt")
    path = tmp_path / "kather_test" / "plip" / "bb.pt"
    assert path.exists()
    np.testing.assert_array_equal(
        cacher.cache_hit_or_miss_raw_filename("plipimgkather_test.csv", "/x/bb.pt"), arr
    )


def test_results_handler(tmp_path, monkeypatch):
    pd = pytest.importorskip("pandas")
    monkeypatch.setenv("PC_RESULTS_FOLDER", str(tmp_path))
    rh = ResultsHandler("kather", "zero_shot", {"model": "plip", "seed": 7})
    f = rh.add([{"Accuracy": 0.9, "split": "test"}])
    rh.add([{"Accuracy": 0.8, "split": "train"}])
    df = pd.read_csv(f, index_col=0)
    assert len(df) == 2
    assert set(["Accuracy", "split", "model", "seed"]) <= set(df.columns)
    assert (df["model"] == "plip").all()


def test_prefetch_loader():
    from plip_tpu.data.loader import PrefetchLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return np.full((4, 4), i, np.float32), i

    loader = PrefetchLoader(DS(), batch_size=4, num_workers=2, device_put=False)
    batches = list(loader)
    assert len(batches) == 3
    (imgs, labels), n = batches[-1]
    assert imgs.shape == (4, 4, 4)  # padded
    assert n == 2
    # order preserved
    (imgs0, labels0), _ = batches[0]
    assert list(labels0) == [0, 1, 2, 3]


def test_prefetch_loader_propagates_errors():
    from plip_tpu.data.loader import PrefetchLoader

    class BadDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise IOError("corrupt image")

    with pytest.raises(IOError):
        list(PrefetchLoader(BadDS(), batch_size=2, device_put=False))


def test_augment_batch_shapes_and_determinism():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8))
    cfg = AugmentConfig(out_size=32)
    key = jax.random.PRNGKey(0)
    out1 = augment_batch(key, imgs, cfg)
    out2 = augment_batch(key, imgs, cfg)
    assert out1.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = augment_batch(jax.random.PRNGKey(1), imgs, cfg)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_augment_identity_config():
    """With all randomness off, augmentation == center-ish crop + normalize."""
    rng = np.random.default_rng(1)
    imgs_np = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    cfg = AugmentConfig(
        out_size=32,
        hflip_prob=0.0,
        degrees=0.0,
        translate=(0.0, 0.0),
        scale_range=(1.0, 1.0),
        shear=(0.0, 0.0),
        perspective_prob=0.0,
    )
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs_np), cfg))
    mean = np.asarray(cfg.mean) * 255
    std = np.asarray(cfg.std) * 255
    expected = (imgs_np.astype(np.float32) - mean) / std
    np.testing.assert_allclose(out, expected, atol=1e-3)


def test_train_transform_static_shape():
    from plip_tpu.data.transform import TrainTransform

    t = TrainTransform(first_resize=64, n_px=32)
    out = t(np.zeros((100, 300, 3), np.uint8))
    assert out.shape == (64, 64, 3)
    out2 = t(np.zeros((50, 40, 3), np.uint8))
    assert out2.shape == (64, 64, 3)


def test_prefetch_loader_early_break_no_leak():
    """Breaking out of iteration must unblock and stop the producer thread."""
    import threading
    import time as _time

    from plip_tpu.data.loader import PrefetchLoader

    class DS:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            return np.zeros((8, 8), np.float32)

    before = threading.active_count()
    loader = PrefetchLoader(DS(), batch_size=2, prefetch=1, device_put=False)
    for i, _ in enumerate(loader):
        if i == 1:
            break
    _time.sleep(1.5)  # producer should notice stop and exit
    assert threading.active_count() <= before + 1


def test_train_transform_thread_deterministic(tmp_path):
    """Host-side random crops are stateless per (seed, epoch, index):
    two threaded loader passes yield bit-identical pixels (a shared
    stateful Generator raced across decode threads before), distinct items
    get distinct draws, and bumping epoch refreshes them."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    from plip_tpu.data.datasets import ImageCaptionDataset
    from plip_tpu.data.loader import PrefetchLoader
    from plip_tpu.data.transform import TrainTransform

    rng = np.random.default_rng(3)
    rows = []
    for i in range(6):
        p = str(tmp_path / f"im_{i}.png")
        Image.fromarray(
            rng.integers(0, 256, (240, 260, 3), dtype=np.uint8)).save(p)
        rows.append({"image": p, "caption": f"c{i}"})
    t = TrainTransform(first_resize=224, n_px=224, seed=0)
    ds = ImageCaptionDataset(pd.DataFrame(rows), t)

    def run():
        loader = PrefetchLoader(ds, batch_size=3, num_workers=2,
                                device_put=False)
        return np.concatenate([np.asarray(b[0]) for b, n in loader])

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
    # distinct items must not share one draw (index folds into the seed)
    assert not np.array_equal(a[0], a[1])
    t.epoch = 1
    c = run()
    assert not np.array_equal(a, c)  # fresh crops next epoch
