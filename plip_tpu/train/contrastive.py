"""Contrastive (InfoNCE) CLIP training — TPU-native rebuild of the reference's
``CLIPTuner`` inner loop (`/root/reference/reproducibility/training_model/clip.py:148-226`).

Semantics preserved:
- symmetric cross-entropy with ``arange(batch)`` ground truth
  (clip.py:186-189)
- logit_scale clamped to [0, ln 100] after each update (clip.py:205-206)
- AdamW with the reference's betas/eps/weight-decay defaults (clip.py:107-118)
- cosine-warmup LR (scheduler.py:18-28)

TPU-native replacements:
- the fp16↔fp32 weight-swap dance (clip.py:197-202) becomes bf16 compute with
  fp32 params + fp32 optimizer state — no swapping, MXU-native
- single-GPU batches become a ``dp×tp`` mesh: the batch is sharded over dp and
  the B×B similarity matmul makes XLA all-gather embeddings over ICI, which IS
  global-batch InfoNCE (what OpenCLIP does with torch.distributed.all_gather,
  derived here from sharding annotations instead)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import clip as jclip
from ..models.config import CLIPConfig
from .scheduler import cosine_lr

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def clip_loss(
    params: Params,
    pixels: jnp.ndarray,
    ids: jnp.ndarray,
    cfg: CLIPConfig,
    dtype=jnp.float32,
    remat: "bool | str" = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Symmetric InfoNCE: mean of image->text and text->image CE.

    ``remat``: False / True / "mlp" — see models/layers.transformer for the
    measured memory/speed trade ("mlp" is the fastest fitting policy for
    large-batch single-chip training)."""
    logits_per_image, logits_per_text = jclip.forward(
        params, pixels, ids, cfg, dtype=dtype, remat=remat
    )
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits_per_image, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits_per_text, labels)
    loss = (loss_i.mean() + loss_t.mean()) / 2.0
    acc = (jnp.argmax(logits_per_image, axis=-1) == labels).mean()
    return loss, {"loss": loss, "acc_i2t": acc}


def _accum_infonce_grads(
    params: Params,
    pixels: jnp.ndarray,
    ids: jnp.ndarray,
    cfg: CLIPConfig,
    dtype,
    remat: "bool | str",
    accum_steps: int,
) -> Tuple[Tuple[jnp.ndarray, Dict[str, jnp.ndarray]], Params]:
    """GRADIENT-EXACT InfoNCE accumulation over ``accum_steps`` microbatches.

    Naive per-microbatch accumulation is WRONG for contrastive loss — the
    B×B similarity couples every pair, so k independent InfoNCE losses over
    B/k-sized batches optimize a different (easier) objective. This is the
    two-pass scheme (the contract behind OpenCLIP's ``--accum-freq``, built
    here as an exact chain rule instead of a stop-grad resubstitution):

    1. embed the FULL batch microbatch-by-microbatch under ``lax.scan``
       (no activation liveness beyond one microbatch);
    2. differentiate the cheap loss-on-embeddings once: dL/dZ [B, D] and the
       complete logit-scale gradient;
    3. re-embed each microbatch under ``jax.vjp`` and pull its dZ slice back
       to parameter space, accumulating grads in fp32 via the scan carry.

    ``dL/dθ = Σ_m (∂Z_m/∂θ)ᵀ (∂L/∂Z_m)`` — identical (up to fp reassociation
    and one extra forward's rounding) to the unaccumulated global-batch
    gradient, at ~1.33× its FLOPs (one extra forward on a fwd+bwd ≈ 3-fwd
    step; measured 1.22× step time at B/32 b512 — PERF.md) and 1/k its
    activation memory. Peak-memory lever for batches the single-step path
    can't fit (e.g. L/14 beyond b96; CLAUDE.md perf facts).
    """
    B = pixels.shape[0]
    k = int(accum_steps)
    if B % k:
        raise ValueError(f"batch {B} not divisible by accum_steps {k}")
    mb = B // k
    r_img, r_txt = remat if isinstance(remat, tuple) else (remat, remat)

    px = pixels.reshape(k, mb, *pixels.shape[1:])
    tx = ids.reshape(k, mb, ids.shape[1])

    def embed_mb(p, px_m, tx_m):
        zi = jclip.l2_normalize(jclip.encode_image(p, px_m, cfg, dtype, r_img))
        zt = jclip.l2_normalize(jclip.encode_text(p, tx_m, cfg, dtype, r_txt))
        return zi, zt

    # pass 1: full-batch embeddings (constants w.r.t. params here)
    def p1(_, xs):
        return None, embed_mb(params, xs[0], xs[1])

    _, (zi, zt) = jax.lax.scan(p1, None, (px, tx))
    zi = jax.lax.stop_gradient(zi.reshape(B, -1))
    zt = jax.lax.stop_gradient(zt.reshape(B, -1))

    # the loss on embeddings — same islands as models.clip.forward + clip_loss
    def loss_from_embeds(args):
        zi_, zt_, ls = args
        scale = jnp.exp(jnp.clip(ls, max=cfg.logit_scale_max)).astype(jnp.float32)
        logits_i = scale * zi_ @ zt_.T
        labels = jnp.arange(B)
        loss_i = optax.softmax_cross_entropy_with_integer_labels(logits_i, labels)
        loss_t = optax.softmax_cross_entropy_with_integer_labels(logits_i.T, labels)
        loss = (loss_i.mean() + loss_t.mean()) / 2.0
        acc = (jnp.argmax(logits_i, axis=-1) == labels).mean()
        return loss, (loss, acc)

    (_, (loss, acc)), (dzi, dzt, d_ls) = jax.value_and_grad(
        loss_from_embeds, has_aux=True
    )((zi, zt, params["logit_scale"]))

    # pass 2: per-microbatch VJP, fp32 grad accumulation in the scan carry
    dzi = dzi.reshape(k, mb, -1)
    dzt = dzt.reshape(k, mb, -1)

    def p2(gacc, xs):
        px_m, tx_m, dzi_m, dzt_m = xs
        _, vjp_fn = jax.vjp(lambda p: embed_mb(p, px_m, tx_m), params)
        (g_m,) = vjp_fn((dzi_m, dzt_m))
        gacc = jax.tree.map(
            lambda a, g: a + g.astype(jnp.float32), gacc, g_m
        )
        return gacc, None

    zero = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    grads, _ = jax.lax.scan(p2, zero, (px, tx, dzi, dzt))
    # embed_mb never touches logit_scale; its complete grad came from the
    # loss-on-embeddings pass
    grads["logit_scale"] = grads["logit_scale"] + d_ls
    return (loss, {"loss": loss, "acc_i2t": acc}), grads


def make_optimizer(
    base_lr: float = 5e-6,
    warmup: int = 50,
    total_steps: int = 1000,
    weight_decay: float = 0.2,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW matching the reference defaults with the exact cosine-warmup
    schedule. The reference constructs ``optim.AdamW(params, lr, weight_decay)``
    (clip.py:107-110), i.e. torch defaults betas=(0.9, 0.999), eps=1e-8 —
    matched here. (OpenCLIP's paper values (0.9, 0.98)/1e-6 are NOT what the
    reference runs; pass them explicitly if wanted.)"""
    return fused_adamw(
        learning_rate=cosine_lr(base_lr, warmup, total_steps),
        b1=betas[0],
        b2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
    )


def fused_adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=0.2) -> optax.GradientTransformation:
    """AdamW as ONE tree_map pass — trajectory-identical to ``optax.adamw``
    (same formulas, same schedule stepping) but each leaf's whole chain
    (m/v update, bias correction, decayed update) is a single 4-in/3-out
    elementwise op, so XLA emits one fused RMW loop per leaf instead of
    materializing the intermediate `updates` trees between the chained
    ``scale_by_adam``/``add_decayed_weights``/``scale_by_learning_rate``
    stages. The 151M-param ViT-B/32 step spends ~8.9 ms in optax.adamw vs a
    ~5.2 ms traffic floor (experiments/bench_adamw_only.py) — this recovers
    most of that gap.

    State = optax.ScaleByAdamState (count/mu/nu), so checkpoints hold the
    same leaves. Returned updates compose with ``optax.apply_updates``."""
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fused_adamw requires params (weight decay)")
        # optax.adamw stepping: scale_by_adam bias-corrects with count+1;
        # the lr schedule is evaluated at the PRE-increment count.
        lr = sched(state.count).astype(jnp.float32)
        count = optax.safe_int32_increment(state.count)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def leaf(g, m, v, p):
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * jnp.square(g)
            upd = -lr * ((m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
                         + weight_decay * p)
            return m2, v2, upd

        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        out = [leaf(g, m, v, p)
               for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p)]
        mu = jax.tree.unflatten(treedef, [o[0] for o in out])
        nu = jax.tree.unflatten(treedef, [o[1] for o in out])
        updates = jax.tree.unflatten(treedef, [o[2] for o in out])
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def clamp_logit_scale(params: Params, cfg: CLIPConfig) -> Params:
    """In-place-equivalent of ``logit_scale.clamp_(0, ln 100)`` (clip.py:205-206)."""
    clamped = jnp.clip(params["logit_scale"], 0.0, cfg.logit_scale_max)
    return {**params, "logit_scale": clamped}


def init_train_state(
    params: Params, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32)
    )


def gather_to_host(tree):
    """Fetch a (possibly multi-host-sharded) pytree as global numpy arrays.

    Single-process: plain device_get. Multi-process: every process must call
    this (the all-gather is a collective); each receives the full global
    value, so callers can then write from process 0 only."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.process_allgather(x, tiled=True), tree
        )
    return jax.device_get(tree)


def save_train_state(path: str, state: TrainState, cfg: CLIPConfig) -> None:
    """Full checkpoint: params + optimizer state + step — enables resume,
    which the reference cannot do (SURVEY.md §5: torch.save of model
    state_dict only, no optimizer/step).

    Multi-host safe: params/opt-state are gathered collectively (so every
    process participates) and only process 0 touches the filesystem — a
    naive per-process torch.save-style write would have every host clobber
    the same file on shared storage."""
    import numpy as np

    from ..utils.checkpoint import save_checkpoint

    params = gather_to_host(state.params)
    opt = gather_to_host(state.opt_state)
    if jax.process_index() != 0:
        return
    save_checkpoint(path, params, cfg)
    flat_opt, treedef = jax.tree.flatten(opt)
    np.savez(
        path + ".opt",
        __step__=np.asarray(state.step),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat_opt)},
    )


def load_train_state(
    path: str, optimizer: optax.GradientTransformation
) -> Tuple[TrainState, "CLIPConfig"]:
    """Resume from save_train_state output. The optimizer must be constructed
    identically (same schedule/hparams) — its state treedef is rebuilt from a
    fresh init and filled with the saved leaves."""
    import numpy as np

    from ..utils.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(path)
    data = np.load(path + ".opt.npz", allow_pickle=False)
    fresh = optimizer.init(params)
    flat, treedef = jax.tree.flatten(fresh)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    opt_state = jax.tree.unflatten(treedef, leaves)
    step = jnp.asarray(data["__step__"])
    return TrainState(params=params, opt_state=opt_state, step=step), cfg


def save_train_state_orbax(
    path: str, state: TrainState, cfg: CLIPConfig
) -> None:
    """Full-state checkpoint via orbax — the PRODUCTION multi-host path.

    Unlike ``save_train_state`` (gather-everything-to-process-0 npz, fine
    single-host), orbax writes each process's shards directly from device:
    no host-side materialization of the global 3×-params state (15 GB at
    ViT-L/14 fp32), atomic tmp-dir + rename, and sharding metadata recorded
    so ``load_train_state_orbax`` can restore onto the SAME topology (or a
    caller-provided target sharding). The model config rides along as a
    JSON sidecar in the checkpoint directory (same encoding as the npz
    format — utils.checkpoint.cfg_to_json).

    Capability the reference lacks entirely (its torch.save keeps weights
    only, training_model/clip.py:221-222).
    """
    import os

    import orbax.checkpoint as ocp

    from ..utils.checkpoint import cfg_to_json

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        ckptr.save(
            path,
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step},
            force=True,
        )
        ckptr.wait_until_finished()
    finally:
        ckptr.close()
    if jax.process_index() == 0:
        with open(os.path.join(path, "clip_config.json"), "w") as f:
            f.write(cfg_to_json(cfg))


def load_train_state_orbax(
    path: str,
    optimizer: optax.GradientTransformation,
    params_like: "Params | None" = None,
) -> Tuple[TrainState, "CLIPConfig"]:
    """Resume from ``save_train_state_orbax``. The optimizer must be
    constructed identically (same schedule/hparams) — the restore target's
    treedef comes from a fresh ``optimizer.init``.

    ``params_like``: optional pytree of (possibly sharded) arrays or
    ShapeDtypeStructs defining the restore placement — pass mesh-sharded
    params (e.g. from ``parallel.mesh.shard_params`` over an abstract init)
    to restore each shard straight to its device. Default: placement from
    the checkpoint's recorded shardings (same-topology resume).
    """
    import os

    import orbax.checkpoint as ocp

    from ..utils.checkpoint import cfg_from_json

    path = os.path.abspath(path)
    with open(os.path.join(path, "clip_config.json")) as f:
        cfg = cfg_from_json(f.read())

    import numpy as np

    ckptr = ocp.StandardCheckpointer()
    try:
        concrete_like = params_like is not None and all(
            isinstance(x, jax.Array) for x in jax.tree.leaves(params_like)
        )
        if params_like is None:
            # placement from the checkpoint's recorded shardings; shapes/
            # dtypes from its metadata (the optax namedtuple structure
            # would not survive a target-less restore, so a full target is
            # always built)
            meta = ckptr.metadata(path).item_metadata
            abstract = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
                meta["params"],
            )
            opt_abstract = jax.eval_shape(optimizer.init, abstract)
        else:
            abstract = jax.tree.map(
                ocp.utils.to_shape_dtype_struct, params_like)
            # concrete (sharded) params: init the optimizer on them so the
            # moment zeros inherit each param's placement — the restore
            # target then carries those shardings. Transient allocation,
            # same size as the state being restored.
            opt_abstract = jax.tree.map(
                ocp.utils.to_shape_dtype_struct,
                optimizer.init(params_like) if concrete_like
                else jax.eval_shape(optimizer.init, params_like),
            )
        tgt = {
            "params": abstract,
            "opt_state": opt_abstract,
            "step": jax.ShapeDtypeStruct((), jnp.int32),
        }
        out = ckptr.restore(path, target=tgt)
    finally:
        ckptr.close()
    if concrete_like:
        # optimizer scalars (e.g. adam's count) are not derived from any
        # param, so their restore placement is single-device — replicate
        # them over the params' mesh or jit trips its device check
        from jax.sharding import NamedSharding, PartitionSpec

        mesh_sh = next(
            (x.sharding for x in jax.tree.leaves(params_like)
             if isinstance(getattr(x, "sharding", None), NamedSharding)),
            None,
        )
        if mesh_sh is not None:
            rep = NamedSharding(mesh_sh.mesh, PartitionSpec())

            def _replicate0d(x):
                if x.ndim != 0:
                    return x
                # NOT device_put: on a pod the restored scalar sits on one
                # local device per process and device_put onto the global
                # replicated sharding would be a cross-host transfer
                # (unsupported on CPU, DCN-config-gated on TPU). Every
                # process already holds the value — rebuild the global
                # replicated array from per-process host copies.
                host = np.asarray(x)
                return jax.make_array_from_callback(
                    (), rep, lambda idx: host)

            out["opt_state"] = jax.tree.map(_replicate0d, out["opt_state"])
    # step as a fresh UNCOMMITTED scalar: a committed single-device scalar
    # next to 8-device-sharded params trips jit's device check
    return (
        TrainState(params=out["params"], opt_state=out["opt_state"],
                   step=jnp.asarray(np.asarray(out["step"]))),
        cfg,
    )


def make_train_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    dtype=jnp.float32,
    remat: "bool | str" = False,
    accum_steps: int = 1,
):
    """Build the jitted train step.

    Multi-chip use needs no extra machinery here: shard the params with
    ``parallel.mesh.shard_params`` and batches with ``shard_batch`` — ``jit``
    follows input shardings, and XLA lays the collectives over ICI (dp
    all-gather for the B×B similarity, tp reduces in the blocks). Optimizer
    state initialized from sharded params inherits their sharding.

    ``accum_steps > 1`` splits the batch into that many microbatches with
    GRADIENT-EXACT two-pass InfoNCE accumulation (see
    ``_accum_infonce_grads``) — same update as the single-pass step, 1/k the
    activation memory, ~1.33× the FLOPs (measured 1.22× step time, PERF.md).
    """

    def step_fn(state: TrainState, pixels, ids) -> Tuple[TrainState, Dict]:
        if accum_steps > 1:
            (loss, metrics), grads = _accum_infonce_grads(
                state.params, pixels, ids, cfg, dtype, remat, accum_steps
            )
        else:
            (loss, metrics), grads = jax.value_and_grad(clip_loss, has_aux=True)(
                state.params, pixels, ids, cfg, dtype, remat
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = clamp_logit_scale(params, cfg)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))
