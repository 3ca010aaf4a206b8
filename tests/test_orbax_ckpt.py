"""Orbax full-train-state checkpointing (`train.contrastive.
save_train_state_orbax` / `load_train_state_orbax`) — the production
multi-host path (per-process shard writes, no host gather), vs the npz
gather path. Reference has neither (torch.save weights-only,
training_model/clip.py:221-222)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("orbax.checkpoint")

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (
    init_train_state,
    load_train_state_orbax,
    make_optimizer,
    make_train_step,
    save_train_state_orbax,
)


@pytest.fixture(scope="module")
def setup():
    cfg = CLIPConfig.tiny()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    B = 8
    px = jnp.asarray(rng.standard_normal(
        (B, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32))
    ids = np.zeros((B, cfg.text.context_length), np.int32)
    ids[:, 0] = 1
    ids[:, 1:4] = rng.integers(2, cfg.text.vocab_size - 2, (B, 3))
    ids[:, 4] = cfg.text.eot
    return cfg, params, px, jnp.asarray(ids)


def test_orbax_roundtrip_resume_bitexact(setup, tmp_path):
    """Save after 2 steps, restore, run 2 more — trajectory identical to an
    uninterrupted 4-step run (params + optimizer moments + step resumed)."""
    cfg, params, px, ids = setup
    opt = make_optimizer(1e-3, warmup=2, total_steps=10)
    step = make_train_step(cfg, opt)

    state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    ref = []
    for _ in range(4):
        state, m = step(state, px, ids)
        ref.append(float(m["loss"]))

    state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    got = []
    for _ in range(2):
        state, m = step(state, px, ids)
        got.append(float(m["loss"]))
    ckpt = str(tmp_path / "orbax_ck")
    save_train_state_orbax(ckpt, state, cfg)

    restored, cfg2 = load_train_state_orbax(ckpt, opt)
    assert cfg2.embed_dim == cfg.embed_dim
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for _ in range(2):
        restored, m = step(restored, px, ids)
        got.append(float(m["loss"]))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_orbax_sharded_restore(setup, tmp_path):
    """params_like with mesh shardings restores each leaf pre-sharded."""
    from plip_tpu.parallel.mesh import create_mesh, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg, params, px, ids = setup
    opt = make_optimizer(1e-3, warmup=2, total_steps=10)
    state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    ckpt = str(tmp_path / "orbax_sh")
    save_train_state_orbax(ckpt, state, cfg)

    mesh = create_mesh(dp=4, tp=2)
    sharded_like = shard_params(jax.tree.map(jnp.copy, params), mesh)
    restored, _ = load_train_state_orbax(ckpt, opt, params_like=sharded_like)
    lk = sharded_like["visual"]["blocks"]["mlp"]["fc1"]["kernel"]
    rk = restored.params["visual"]["blocks"]["mlp"]["fc1"]["kernel"]
    assert rk.sharding == lk.sharding, (rk.sharding, lk.sharding)
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(lk))
    # and a sharded train step runs from the restored state
    step = make_train_step(cfg, opt)
    from plip_tpu.parallel.mesh import shard_batch

    restored2, m = step(restored, shard_batch(px, mesh),
                        shard_batch(ids, mesh))
    assert np.isfinite(float(m["loss"]))


def test_orbax_overwrite_allowed(setup, tmp_path):
    """Re-saving to the same path (resume workflows) must not raise."""
    cfg, params, px, ids = setup
    opt = make_optimizer(1e-3, warmup=2, total_steps=10)
    state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    ckpt = str(tmp_path / "orbax_ow")
    save_train_state_orbax(ckpt, state, cfg)
    save_train_state_orbax(ckpt, state, cfg)
    restored, _ = load_train_state_orbax(ckpt, opt)
    assert int(restored.step) == 0


def test_clip_tuner_orbax_save_and_resume(tmp_path):
    """tuner(save_full_state="orbax") writes per-epoch orbax dirs and
    resume_from=<dir> restarts from them."""
    import os
    from types import SimpleNamespace

    import pandas as pd
    from PIL import Image

    from plip_tpu.models.config import TextConfig, VisionConfig
    from plip_tpu.train.clip_tuner import CLIPTuner
    from plip_tpu.utils.checkpoint import save_checkpoint

    cfg = CLIPConfig(
        vision=VisionConfig(width=32, layers=2, heads=2, image_size=224,
                            patch_size=32),
        text=TextConfig(width=32, layers=2, heads=2, vocab_size=49408,
                        context_length=77),
        embed_dim=16,
    )
    ck = str(tmp_path / "tiny.npz")
    save_checkpoint(ck, jclip.init_params(jax.random.PRNGKey(3), cfg), cfg)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(
            rng.integers(0, 256, (240, 260, 3), np.uint8)).save(p)
        paths.append(p)
    df = pd.DataFrame({"image": paths,
                       "caption": [f"an H&E image {i}" for i in range(8)]})

    args = SimpleNamespace(first_resize=256, pxsize=224, optimizer="AdamW")
    t = CLIPTuner(args=args, backbone=ck, lr=1e-4, warmup=2)
    t.tuner(df, df.iloc[:4], save_directory=str(tmp_path), batch_size=4,
            epochs=1, evaluation_steps=0, num_workers=2, start_time="ob",
            save_full_state="orbax")
    ckdir = str(tmp_path / "epoch_0_ob_model.orbax")
    assert os.path.isdir(ckdir)
    assert os.path.exists(os.path.join(ckdir, "clip_config.json"))

    t2 = CLIPTuner(args=args, backbone=ck, lr=1e-4, warmup=2)
    t2.tuner(df, df.iloc[:4], save_directory=str(tmp_path), batch_size=4,
             epochs=1, evaluation_steps=0, num_workers=2, start_time="ob2",
             resume_from=ckdir)
    assert int(t2.state.step) == 2 + 2  # 2 steps/epoch resumed + 2 more


def test_clip_tuner_orbax_resume_on_mesh(tmp_path, monkeypatch):
    """Regression: resume_from=<orbax dir> with a dp×tp mesh must restore
    sharded (a target-less restore landed the opt state committed on one
    device and the first train step tripped jit's device check).

    Round 5: also runs under the documented production env
    PLIP_TPU_COMPILE_CACHE=<fresh dir> — this exact combination used to
    SIGABRT the process (XLA:CPU persistent-cache AOT deserialization of
    the re-traced mesh train step; see utils/compile_cache.py). The cpu
    gate must keep it alive."""
    import os
    from types import SimpleNamespace

    import pandas as pd
    from PIL import Image

    from plip_tpu.models.config import TextConfig, VisionConfig
    from plip_tpu.parallel.mesh import create_mesh
    from plip_tpu.train.clip_tuner import CLIPTuner
    from plip_tpu.utils.checkpoint import save_checkpoint
    from plip_tpu.utils.compile_cache import enable_from_env

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    monkeypatch.setenv("PLIP_TPU_COMPILE_CACHE", str(tmp_path / "jaxcc"))
    enable_from_env()
    cfg = CLIPConfig(
        vision=VisionConfig(width=128, layers=2, heads=2, image_size=224,
                            patch_size=32),
        text=TextConfig(width=128, layers=2, heads=2, vocab_size=49408,
                        context_length=77),
        embed_dim=16,
    )
    ck = str(tmp_path / "tiny.npz")
    save_checkpoint(ck, jclip.init_params(jax.random.PRNGKey(3), cfg), cfg)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(
            rng.integers(0, 256, (240, 260, 3), np.uint8)).save(p)
        paths.append(p)
    df = pd.DataFrame({"image": paths,
                       "caption": [f"an H&E image {i}" for i in range(8)]})
    args = SimpleNamespace(first_resize=256, pxsize=224, optimizer="AdamW")
    mesh = create_mesh(dp=4, tp=2)

    t = CLIPTuner(args=args, backbone=ck, lr=1e-4, warmup=2, mesh=mesh)
    suffix = t.tuner(df, df.iloc[:4], save_directory=str(tmp_path),
                     batch_size=4, epochs=1, evaluation_steps=0,
                     num_workers=2, start_time="mo",
                     save_full_state="orbax")
    assert suffix == "_mo_model.orbax"  # names what was actually written
    ckdir = os.path.join(str(tmp_path), f"epoch_0{suffix}")
    assert os.path.isdir(ckdir)

    t2 = CLIPTuner(args=args, backbone=ck, lr=1e-4, warmup=2, mesh=mesh)
    t2.tuner(df, df.iloc[:4], save_directory=str(tmp_path), batch_size=4,
             epochs=1, evaluation_steps=0, num_workers=2, start_time="mo2",
             resume_from=ckdir)
    assert int(t2.state.step) == 4
    fc1 = t2.state.params["visual"]["blocks"]["mlp"]["fc1"]["kernel"]
    assert "tp" in str(fc1.sharding.spec)
