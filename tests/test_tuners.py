"""End-to-end tests for CLIPTuner (contrastive) and FineTuner (supervised)
on tiny configs + synthetic datasets."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax

pd = pytest.importorskip("pandas")

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig
from plip_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    cfg = CLIPConfig(
        vision=VisionConfig(width=32, layers=2, heads=2, image_size=224, patch_size=32),
        text=TextConfig(width=32, layers=2, heads=2, vocab_size=49408, context_length=77),
        embed_dim=16,
    )
    params = jclip.init_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path_factory.mktemp("t") / "tiny.npz")
    save_checkpoint(path, params, cfg)
    return path


@pytest.fixture(scope="module")
def image_caption_df(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("traindata")
    rows = []
    for i in range(8):
        arr = rng.integers(0, 256, (240, 260, 3), dtype=np.uint8)
        p = str(d / f"im_{i}.jpg")
        Image.fromarray(arr).save(p)
        rows.append({"image": p, "caption": f"an H&E image of class {i % 2}"})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def image_label_df(image_caption_df):
    df = image_caption_df.copy()
    df["label"] = [i % 2 for i in range(len(df))]
    return df[["image", "label"]]


def test_clip_tuner_end_to_end(tiny_ckpt, image_caption_df, tmp_path):
    from plip_tpu.train.clip_tuner import CLIPTuner

    tuner = CLIPTuner(
        args=SimpleNamespace(first_resize=256, pxsize=224, optimizer="AdamW"),
        backbone=tiny_ckpt,
        lr=1e-4,
        warmup=2,
    )
    suffix = tuner.tuner(
        image_caption_df,
        image_caption_df.iloc[:4],
        save_directory=str(tmp_path),
        batch_size=4,
        epochs=2,
        evaluation_steps=0,
        num_workers=2,
        start_time="teststamp",
    )
    assert suffix == "_teststamp_model.npz"
    assert os.path.exists(tmp_path / "epoch_0_teststamp_model.npz")
    assert os.path.exists(tmp_path / "epoch_1_teststamp_model.npz")
    # checkpoint loads back
    from plip_tpu.utils.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(str(tmp_path / "epoch_1_teststamp_model.npz"))
    assert cfg.embed_dim == 16


def test_clip_tuner_learns(tiny_ckpt, image_caption_df, tmp_path):
    """Two distinct (image, caption) pairs, many steps: loss must drop."""
    from plip_tpu.train.clip_tuner import CLIPTuner
    import logging

    records = []

    class Cap:
        def info(self, msg):
            records.append(msg)

    from plip_tpu.ops.augment import AugmentConfig

    df = image_caption_df.iloc[:4]
    # deterministic augmentation so the loss trend is clean
    ident_aug = AugmentConfig(
        out_size=224, hflip_prob=0.0, degrees=0.0, translate=(0.0, 0.0),
        scale_range=(1.0, 1.0), shear=(0.0, 0.0), perspective_prob=0.0,
    )
    tuner = CLIPTuner(
        args=SimpleNamespace(first_resize=224, pxsize=224, optimizer="AdamW"),
        backbone=tiny_ckpt,
        lr=5e-4,
        warmup=2,
        logging=Cap(),
        aug_cfg=ident_aug,
    )
    tuner.tuner(
        df, df, save_directory=str(tmp_path), batch_size=4, epochs=6,
        evaluation_steps=0, num_workers=2, start_time="learn",
    )
    losses = [
        float(m.split("loss: ")[1])
        for m in records
        if m.startswith("[Train - this batch]")
    ]
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("model_name", ["plip", "resnet18"])
def test_finetuner_end_to_end(tiny_ckpt, image_label_df, model_name):
    from plip_tpu.train.finetune import FineTuner

    args = SimpleNamespace(
        model_name=model_name, optimizer="AdamW", PC_CLIP_ARCH="ViT-B/32"
    )
    ft = FineTuner(
        args=args,
        backbone=tiny_ckpt if model_name == "plip" else None,
        num_classes=2,
        lr=1e-4,
    )
    perf = ft.tuner(
        image_label_df,
        image_label_df.iloc[:4],
        test_dataframe=image_label_df.iloc[4:],
        batch_size=4,
        epochs=2,
        evaluation_steps=0,
        num_workers=2,
    )
    assert list(perf.columns)[:4] == ["epoch", "loss", "f1_weighted", "f1_macro"]
    assert len(perf) == 2
    assert "f1_test_weighted" in perf.columns
    assert perf["f1_weighted"].dtype == float


def test_finetuner_accum_matches_single(tiny_ckpt, image_label_df):
    """Supervised CE accumulation is exact (sum-then-normalize): identical
    deterministic run with accum_steps=2 reports the same losses as
    accum_steps=1 (fp32, same seed/init, unshuffled loader)."""
    from plip_tpu.train.finetune import FineTuner

    args = SimpleNamespace(
        model_name="plip", optimizer="AdamW", PC_CLIP_ARCH="ViT-B/32"
    )
    losses = {}
    for k in (1, 2):
        ft = FineTuner(args=args, backbone=tiny_ckpt, num_classes=2,
                       lr=1e-3, seed=0)
        perf = ft.tuner(
            image_label_df,
            image_label_df.iloc[:4],
            batch_size=4,
            epochs=2,
            evaluation_steps=0,
            num_workers=2,
            accum_steps=k,
        )
        losses[k] = perf["loss"].astype(float).to_numpy()
    np.testing.assert_allclose(losses[2], losses[1], rtol=2e-5, atol=1e-6)


def test_finetuner_accum_guards(tiny_ckpt, image_label_df):
    from plip_tpu.train.finetune import FineTuner

    ft = FineTuner(
        args=SimpleNamespace(model_name="resnet18", optimizer="AdamW"),
        num_classes=2, lr=1e-4,
    )
    with pytest.raises(ValueError, match="BatchNorm"):
        ft.tuner(image_label_df, image_label_df.iloc[:4], batch_size=4,
                 epochs=1, evaluation_steps=0, accum_steps=2)

    ft2 = FineTuner(
        args=SimpleNamespace(model_name="plip", optimizer="AdamW",
                             PC_CLIP_ARCH="ViT-B/32"),
        backbone=tiny_ckpt, num_classes=2, lr=1e-4,
    )
    with pytest.raises(ValueError, match="divisible"):
        ft2.tuner(image_label_df, image_label_df.iloc[:4], batch_size=4,
                  epochs=1, evaluation_steps=0, accum_steps=3)


def test_finetuner_resnet_bn_buffer_semantics(image_label_df):
    """torch-parity BN: running stats advance via EMA under training (buffer
    semantics), and the optimizer never touches them (ADVICE r1, medium).

    At lr=0: buffers must still move (model.train() updates them every
    forward) while learnable affine params must stay put (no gradient step,
    and buffers masked from weight decay)."""
    from plip_tpu.train.finetune import FineTuner

    args = SimpleNamespace(model_name="resnet18", optimizer="AdamW")
    ft = FineTuner(args=args, num_classes=2, lr=0.0)
    init_mean = np.array(ft.params["bn1"]["mean"])
    init_scale = np.array(ft.params["bn1"]["scale"])
    ft.tuner(
        image_label_df, image_label_df.iloc[:4], batch_size=4, epochs=1,
        evaluation_steps=0, num_workers=2,
    )
    new_mean = np.array(ft.state.params["bn1"]["mean"])
    new_scale = np.array(ft.state.params["bn1"]["scale"])
    assert not np.allclose(new_mean, init_mean), "BN running mean never updated"
    assert np.allclose(new_scale, init_scale), "optimizer touched BN affine at lr=0"


def test_finetuner_clip_backbone_guard(tiny_ckpt):
    from plip_tpu.train.finetune import FineTuner

    with pytest.raises(Exception, match="wrong"):
        FineTuner(
            args=SimpleNamespace(model_name="clip", optimizer="AdamW",
                                 PC_CLIP_ARCH="ViT-B/32"),
            backbone=tiny_ckpt,
            num_classes=2,
        )


def test_finetuner_unknown_model():
    from plip_tpu.train.finetune import FineTuner

    with pytest.raises(Exception, match="No such model"):
        FineTuner(args=SimpleNamespace(model_name="alexnet", optimizer="AdamW"),
                  num_classes=2)


def test_finetuner_adam_is_adam():
    """The reference's 'Adam'→Adagrad copy-paste bug must NOT be replicated."""
    from plip_tpu.train.finetune import _make_optimizer
    import optax

    opt = _make_optimizer("Adam", 1e-3, 0.0)
    adam_state = opt.init({"w": np.zeros(3, np.float32)})
    # Adam state carries mu and nu; Adagrad state carries sum-of-squares only
    names = str(type(adam_state[0]) if isinstance(adam_state, tuple) else adam_state)
    assert "Adam" in names or "ScaleByAdam" in str(adam_state)


def test_clip_tuner_auto_accum_oom_fallback(tiny_ckpt, image_caption_df,
                                            tmp_path, monkeypatch):
    """accum_steps="auto": a simulated device RESOURCE_EXHAUSTED on the
    first step transparently retries with the smallest fitting
    accumulation, and the resulting loss trajectory equals an explicit
    accum_steps=2 run (the two-pass scheme is gradient-exact)."""
    import plip_tpu.train.clip_tuner as ct

    real_make = ct.make_train_step
    built = []

    def fake_make(cfg, opt, dtype=None, remat=False, accum_steps=1):
        built.append(accum_steps)
        step = real_make(cfg, opt, dtype=dtype, remat=remat,
                         accum_steps=accum_steps)

        def wrapped(state, px, ids):
            if accum_steps < 2:
                raise ValueError(
                    "RESOURCE_EXHAUSTED: TPU backend error (simulated)")
            return step(state, px, ids)

        return wrapped

    def run(accum_setting, patched):
        if patched:
            monkeypatch.setattr(ct, "make_train_step", fake_make)
        else:
            monkeypatch.setattr(ct, "make_train_step", real_make)
        from plip_tpu.train.clip_tuner import CLIPTuner

        t = CLIPTuner(
            args=SimpleNamespace(first_resize=256, pxsize=224,
                                 optimizer="AdamW"),
            backbone=tiny_ckpt, lr=1e-4, warmup=2,
            accum_steps=accum_setting,
        )
        records = []
        t.logging = SimpleNamespace(
            info=lambda msg, *a: records.append(msg % a if a else msg),
            warning=lambda msg, *a: records.append(msg % a if a else msg),
        )
        t.tuner(image_caption_df, image_caption_df.iloc[:4],
                save_directory=str(tmp_path), batch_size=4, epochs=1,
                evaluation_steps=0, num_workers=2, start_time="aa")
        losses = [
            float(r.rsplit("loss: ", 1)[1]) for r in records
            if "[Train - this batch]" in r
        ]
        return losses, records

    losses_auto, records = run("auto", patched=True)
    assert built[:2] == [1, 2], built  # OOM at 1, retried at 2
    assert any("OOM at accum_steps=1" in r for r in records)
    losses_k2, _ = run(2, patched=False)
    np.testing.assert_allclose(losses_auto, losses_k2, rtol=2e-5)


def test_next_divisor():
    from plip_tpu.train.clip_tuner import _next_divisor

    assert _next_divisor(8, 1) == 2
    assert _next_divisor(8, 2) == 4
    assert _next_divisor(6, 2) == 3
    assert _next_divisor(7, 1) == 7  # prime batch: only the full split
    assert _next_divisor(4, 4) is None
