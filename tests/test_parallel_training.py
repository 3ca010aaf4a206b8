"""Multi-device training tests on the 8-device virtual CPU mesh.

Covers: dp-sharded InfoNCE (the all-gather path), tp param sharding, and
single-device equivalence of the sharded step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    shard_params,
)
from plip_tpu.train.contrastive import (
    clip_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from plip_tpu.train.scheduler import cosine_lr


@pytest.fixture(scope="module")
def setup():
    cfg = CLIPConfig.tiny()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 16
    pixels = rng.standard_normal(
        (B, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids = np.zeros((B, cfg.text.context_length), np.int32)
    ids[:, 0] = 1
    ids[:, 1:4] = rng.integers(2, cfg.text.vocab_size - 2, (B, 3))
    ids[:, 4] = cfg.text.eot
    return cfg, params, pixels, ids


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_scheduler_matches_reference_formula():
    sched = cosine_lr(1e-3, warmup_length=10, steps=100)
    # warmup: base*(step+1)/warmup
    assert np.isclose(float(sched(0)), 1e-3 * 1 / 10)
    assert np.isclose(float(sched(9)), 1e-3)
    # cosine: step 55 -> e=45, es=90 -> 0.5*(1+cos(pi/2)) = 0.5
    assert np.isclose(float(sched(55)), 0.5e-3, atol=1e-9)
    assert float(sched(99)) < 1e-5


def test_train_step_decreases_loss(setup):
    cfg, params, pixels, ids = setup
    opt = make_optimizer(base_lr=1e-3, warmup=2, total_steps=50)
    step = make_train_step(cfg, opt)
    # copy: the step donates its input state, which would free the fixture
    state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    losses = []
    for _ in range(8):
        state, metrics = step(state, jnp.asarray(pixels), jnp.asarray(ids))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_logit_scale_clamped(setup):
    cfg, params, pixels, ids = setup
    params = dict(jax.tree.map(jnp.copy, params), logit_scale=jnp.asarray(10.0))  # above ln(100)
    opt = make_optimizer(base_lr=0.0, warmup=1, total_steps=10)
    step = make_train_step(cfg, opt)
    state = init_train_state(params, opt)
    state, _ = step(state, jnp.asarray(pixels), jnp.asarray(ids))
    assert float(state.params["logit_scale"]) <= cfg.logit_scale_max + 1e-6


def test_dp_sharded_step_matches_single_device(setup):
    cfg, params, pixels, ids = setup
    opt = make_optimizer(base_lr=1e-3, warmup=2, total_steps=50)

    # single device
    step = make_train_step(cfg, opt)
    s0 = init_train_state(jax.tree.map(jnp.copy, params), opt)
    s0, m0 = step(s0, jnp.asarray(pixels), jnp.asarray(ids))

    # dp=8 mesh
    mesh = create_mesh(dp=8, tp=1)
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    bp, bi = shard_batch((jnp.asarray(pixels), jnp.asarray(ids)), mesh)
    step8 = make_train_step(cfg, opt)
    s8 = init_train_state(sp, opt)
    s8, m8 = step8(s8, bp, bi)

    assert np.isclose(float(m0["loss"]), float(m8["loss"]), rtol=1e-5)
    a = np.asarray(s0.params["text"]["token_embed"])
    b = np.asarray(s8.params["text"]["token_embed"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_dp_tp_mesh_runs(setup):
    cfg, params, pixels, ids = setup
    mesh = create_mesh(dp=2, tp=4)
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    bp, bi = shard_batch((jnp.asarray(pixels), jnp.asarray(ids)), mesh)
    opt = make_optimizer(base_lr=1e-3, warmup=2, total_steps=50)
    step = make_train_step(cfg, opt)
    state = init_train_state(sp, opt)
    state, metrics = step(state, bp, bi)
    assert np.isfinite(float(metrics["loss"]))
    # params keep their tp sharding after the step
    fc1 = state.params["visual"]["blocks"]["mlp"]["fc1"]["kernel"]
    assert "tp" in str(fc1.sharding.spec)


def test_inference_dp_sharded(setup):
    cfg, params, pixels, _ = setup
    mesh = create_mesh(dp=8, tp=1)
    sp = shard_params(params, mesh)
    bp = shard_batch(jnp.asarray(pixels), mesh)
    out = jax.jit(lambda p, x: jclip.encode_image(p, x, cfg))(sp, bp)
    ref = jclip.encode_image(params, jnp.asarray(pixels), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_bad_mesh_shape():
    with pytest.raises(ValueError):
        create_mesh(dp=3, tp=3)


def test_full_size_vit_b32_sharded_compiles():
    """AOT-compile the FULL ViT-B/32 train step over dp=4xtp=2 (compile only;
    execution at this size belongs on real chips)."""
    import optax

    from plip_tpu.parallel.mesh import batch_sharding
    from plip_tpu.train.contrastive import clip_loss

    cfg = CLIPConfig.vit_b32()
    mesh = create_mesh(dp=4, tp=2)
    params = shard_params(jclip.init_params(jax.random.PRNGKey(0), cfg), mesh)
    opt = make_optimizer(1e-5, 10, 100)
    state = init_train_state(params, opt)

    def step_fn(state, pixels, ids):
        (_, metrics), grads = jax.value_and_grad(clip_loss, has_aux=True)(
            state.params, pixels, ids, cfg, jnp.bfloat16, True
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        p = optax.apply_updates(state.params, updates)
        return state._replace(params=p, opt_state=opt_state), metrics

    B = 8
    px = jax.device_put(jnp.zeros((B, 224, 224, 3), jnp.float32), batch_sharding(mesh))
    ids = jax.device_put(jnp.full((B, 77), 49407, jnp.int32), batch_sharding(mesh))
    compiled = jax.jit(step_fn).lower(state, px, ids).compile()
    assert compiled.memory_analysis() is not None
