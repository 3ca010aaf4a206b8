"""Gradient-exact two-pass InfoNCE accumulation (`contrastive._accum_infonce_grads`).

Naive microbatch accumulation is WRONG for contrastive loss (the B×B
similarity couples the whole batch); the two-pass scheme must reproduce the
full-batch gradient exactly. These tests pin:

- grads from accum_steps ∈ {2, 4} == single-pass grads (fp32, tight atol);
- the naive per-microbatch loss really IS different (guards against the
  two-pass path silently degenerating into it);
- multi-step trajectory equality through `make_train_step`;
- logit_scale gradient completeness (it only enters via the embedding loss);
- non-divisible batch raises.

Reference contract: the symmetric InfoNCE at
/root/reference/reproducibility/training_model/clip.py:178-189, extended to
larger-than-memory batches (the reference has no equivalent; OpenCLIP's
--accum-freq is the public contract for the feature's semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (
    _accum_infonce_grads,
    clip_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    cfg = CLIPConfig.tiny()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(7)
    B = 16
    pixels = jnp.asarray(
        rng.standard_normal(
            (B, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)
    )
    ids = np.zeros((B, cfg.text.context_length), np.int32)
    ids[:, 0] = 1
    ids[:, 1:4] = rng.integers(2, cfg.text.vocab_size - 2, (B, 3))
    ids[:, 4] = cfg.text.eot
    return cfg, params, pixels, jnp.asarray(ids)


@pytest.mark.parametrize("k", [2, 4])
def test_accum_grads_match_single_pass(setup, k):
    cfg, params, pixels, ids = setup
    (loss_ref, _), grads_ref = jax.value_and_grad(clip_loss, has_aux=True)(
        params, pixels, ids, cfg, jnp.float32, False
    )
    (loss_acc, metrics), grads_acc = _accum_infonce_grads(
        params, pixels, ids, cfg, jnp.float32, False, k
    )
    np.testing.assert_allclose(float(loss_acc), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_ref), rtol=1e-6
    )
    for g_a, g_r in zip(jax.tree.leaves(grads_acc), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(
            np.asarray(g_a), np.asarray(g_r), rtol=2e-5, atol=2e-6
        )


def test_logit_scale_grad_complete(setup):
    """logit_scale never enters the embedding towers — its grad must come
    entirely from the loss-on-embeddings pass and match the reference."""
    cfg, params, pixels, ids = setup
    _, grads_ref = jax.value_and_grad(clip_loss, has_aux=True)(
        params, pixels, ids, cfg, jnp.float32, False
    )
    _, grads_acc = _accum_infonce_grads(
        params, pixels, ids, cfg, jnp.float32, False, 4
    )
    np.testing.assert_allclose(
        float(grads_acc["logit_scale"]),
        float(grads_ref["logit_scale"]),
        rtol=1e-5,
    )
    assert abs(float(grads_ref["logit_scale"])) > 0.0


def test_naive_accumulation_would_differ(setup):
    """The objective the two-pass scheme exists to avoid: mean of k
    independent small-batch InfoNCE losses != the global-batch loss."""
    cfg, params, pixels, ids = setup
    k, B = 4, pixels.shape[0]
    mb = B // k
    loss_full, _ = clip_loss(params, pixels, ids, cfg, jnp.float32, False)
    naive = np.mean(
        [
            float(
                clip_loss(
                    params,
                    pixels[i * mb : (i + 1) * mb],
                    ids[i * mb : (i + 1) * mb],
                    cfg,
                    jnp.float32,
                    False,
                )[0]
            )
            for i in range(k)
        ]
    )
    assert abs(float(loss_full) - naive) > 0.05  # ln(B/mb) ≈ 1.39 apart


def test_train_step_trajectory_matches(setup):
    cfg, params, pixels, ids = setup
    losses = {}
    for k in (1, 4):
        opt = make_optimizer(1e-3, warmup=2, total_steps=10)
        # the jitted step donates its input state — give each run its own copy
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        step = make_train_step(cfg, opt, dtype=jnp.float32, accum_steps=k)
        traj = []
        for _ in range(3):
            state, m = step(state, pixels, ids)
            traj.append(float(m["loss"]))
        losses[k] = traj
    np.testing.assert_allclose(losses[4], losses[1], rtol=5e-5)


def test_accum_on_dp_mesh_matches_unsharded(setup):
    """accum_steps composes with the dp mesh: the (k, mb) reshape of a
    dp-sharded batch must produce the same update GSPMD-resharded."""
    from plip_tpu.parallel.mesh import create_mesh, shard_batch, shard_params

    cfg, params, pixels, ids = setup
    opt = make_optimizer(1e-3, warmup=2, total_steps=10)
    step = make_train_step(cfg, opt, dtype=jnp.float32, accum_steps=2)

    state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    state, m_ref = step(state, pixels, ids)

    mesh = create_mesh(dp=4, tp=2)
    p_sh = shard_params(jax.tree.map(jnp.copy, params), mesh)
    state_sh = init_train_state(p_sh, opt)
    state_sh, m_sh = step(
        state_sh, shard_batch(pixels, mesh), shard_batch(ids, mesh)
    )
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    # post-AdamW params of near-zero-grad leaves are sign-brittle (the update
    # is ±lr regardless of magnitude) — compare the well-conditioned leaf,
    # same as test_parallel_training.test_dp_sharded_step_matches_single_device
    a = np.asarray(state.params["text"]["token_embed"])
    b = np.asarray(state_sh.params["text"]["token_embed"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_accum_requires_divisible_batch(setup):
    cfg, params, pixels, ids = setup
    with pytest.raises(ValueError, match="divisible"):
        _accum_infonce_grads(params, pixels, ids, cfg, jnp.float32, False, 3)
