"""Supervised fine-tuning — rebuild of
`/root/reference/reproducibility/fine_tuning/finetune.py:17-331`.

Backbone switch preserved (finetune.py:62-114): {plip, clip} = CLIP image
tower + 512→classes linear head (whole network backprops, finetune.py:80);
resnet18/50/101; vit_b_16/vit_b_32 with replaced heads. Optimizer switch
preserved (AdamW/Adagrad/Adam/SGD) **except** the reference's copy-paste bug
where 'Adam' instantiates Adagrad (finetune.py:136-139) — here 'Adam' is Adam
(SURVEY §7: reference bugs not to replicate).

The fp32↔fp16 swap (finetune.py:289-294) is replaced by bf16-compute/fp32-
param jitted steps; ``tuner`` returns the same ``performance_df`` schema
(epoch, loss, f1_weighted, f1_macro [, f1_test_*]) as finetune.py:305-331.
"""

from __future__ import annotations

import logging as _logging
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.datasets import ImageLabelDataset
from ..data.loader import PrefetchLoader
from ..models import clip as jclip
from ..models import resnet as jres
from ..models import vit as jvit
from ..ops.preprocess import preprocess_batch
from ..utils.checkpoint import load_checkpoint, load_torch_checkpoint
from .scheduler import cosine_lr

Params = Dict[str, Any]


class LinearClassifier:
    """512→num_classes linear head (finetune.py:17-26) as a param dict."""

    @staticmethod
    def init(key, input_size: int, num_classes: int) -> Params:
        return {
            "kernel": jax.random.normal(key, (input_size, num_classes), jnp.float32)
            * (input_size ** -0.5),
            "bias": jnp.zeros((num_classes,), jnp.float32),
        }

    @staticmethod
    def apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(jnp.float32) @ p["kernel"] + p["bias"]


def _bn_buffer_labels(params):
    """Label tree: ``'buffer'`` for BN running mean/var, ``'train'`` elsewhere.

    torch registers running stats as *buffers* — ``model.parameters()`` never
    yields them, so the reference's optimizer (finetune.py:118-139) cannot
    decay or step them. ``optax.multi_transform`` with these labels gives the
    same split; buffers advance only via the EMA in ``jres.merge_bn_stats``.
    """

    def rec(p, is_stat=False):
        if isinstance(p, dict):
            bn = {"scale", "bias", "mean", "var"} <= set(p)
            return {k: rec(v, bn and k in ("mean", "var")) for k, v in p.items()}
        if isinstance(p, list):
            return [rec(v) for v in p]
        return "buffer" if is_stat else "train"

    return rec(params)


def _make_optimizer(name: str, lr_schedule, weight_decay: float):
    if name == "AdamW":
        return optax.adamw(lr_schedule, weight_decay=weight_decay)
    if name == "Adagrad":
        return optax.adagrad(lr_schedule)
    if name == "Adam":
        return optax.adam(lr_schedule)  # reference bug (Adam→Adagrad) fixed
    if name == "SGD":
        return optax.sgd(lr_schedule)
    raise ValueError(f"unknown optimizer {name!r}")


class _TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


class FineTuner:
    """args needs: model_name, optimizer, PC_CLIP_ARCH (for clip/plip)."""

    def __init__(
        self,
        args=None,
        logging=None,
        backbone: Optional[str] = None,
        num_classes: Optional[int] = None,
        lr: float = 5e-5,
        weight_decay: float = 0.2,
        warmup: int = 0,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        self.args = args
        self.logging = logging or _logging
        self.warmup = warmup
        self.hyper_params = {"lr": lr, "weight_decay": weight_decay}
        self.num_classes = num_classes
        self.dtype = dtype
        self.model_name = args.model_name
        key = jax.random.PRNGKey(seed)

        if self.model_name in ("plip", "clip"):
            if backbone is not None:
                if self.model_name == "clip":
                    raise Exception("This is wrong.")  # finetune.py:76-78
                if backbone.endswith(".npz"):
                    self.clip_params, self.clip_cfg = load_checkpoint(backbone)
                else:
                    self.clip_params, self.clip_cfg = load_torch_checkpoint(backbone)
            else:
                from ..models.config import ARCHITECTURES

                arch = getattr(args, "PC_CLIP_ARCH", "ViT-B/32")
                self.clip_cfg = ARCHITECTURES[arch]()
                self.clip_params = jclip.init_params(key, self.clip_cfg)
            head = LinearClassifier.init(
                jax.random.fold_in(key, 1), self.clip_cfg.embed_dim, num_classes
            )
            self.params: Params = {"backbone": self.clip_params, "head": head}
        elif self.model_name.startswith("resnet"):
            self.arch = self.model_name
            params = jres.init_params(key, self.arch, num_classes=num_classes)
            if backbone is not None:
                import torch

                sd = torch.load(backbone, map_location="cpu")
                loaded = jres.from_torch_state_dict(sd, self.arch, include_fc=False)
                loaded["fc"] = params["fc"]
                params = loaded
            self.params = params
        elif self.model_name.startswith("vit"):
            self.params = jvit.init_params(key, self.model_name, num_classes)
        else:
            raise Exception("No such model.")  # finetune.py:113-114

        # NOTE: the reference applies the CLIP preprocess (CLIP mean/std) to
        # EVERY backbone in FineTuner, including resnets/vits
        # (finetune.py:232-236 uses self.preprocess from clip.load throughout)
        # — we match that for parity.
        self.image_mean, self.image_std = None, None

        self.optimizer_name = getattr(args, "optimizer", "AdamW")

    # ------------------------------------------------------------------

    def _forward(self, params: Params, pixels: jnp.ndarray, training: bool):
        """(logits, bn_stats|None) for a preprocessed NHWC batch
        (finetune.py:165-172).

        The reference fine-tunes under ``model.train()``, so torchvision
        resnets normalize with *batch* statistics and update the running
        buffers every step (finetune.py:282-296). Matched here: the train
        step runs BN in training mode and folds the returned running stats
        back into params (``jres.merge_bn_stats``); eval uses the running
        stats."""
        if self.model_name in ("plip", "clip"):
            feats = jclip.encode_image(
                params["backbone"], pixels, self.clip_cfg, dtype=self.dtype
            )
            return LinearClassifier.apply(params["head"], feats), None
        if self.model_name.startswith("resnet"):
            logits, stats = jres.forward(params, pixels, self.arch, training=training)
            return logits, (stats if training else None)
        return jvit.forward(params, pixels, self.model_name, dtype=self.dtype), None

    def _preprocess(self, images_u8: np.ndarray) -> jnp.ndarray:
        kw = {}
        if self.image_mean is not None:
            kw = {"mean": self.image_mean, "std": self.image_std}
        return preprocess_batch(images_u8, **kw)

    def calculate_f1_score(self, outputs, labels, average="weighted"):
        from sklearn.metrics import f1_score

        predicted = np.argmax(np.asarray(outputs), axis=1)
        return f1_score(np.asarray(labels), predicted, average=average)

    def valid_evaluation(self, loader, batch_size):
        total_loss = 0.0
        outs, labs = [], []
        for (images, labels), n in loader:
            pixels = self._preprocess(images)
            logits = self._eval_fn(self.state.params, pixels)
            logits = np.asarray(logits)[:n]
            labels = np.asarray(labels)[:n]
            # reference sums per-batch mean CE over batches (finetune.py:200)
            logp = logits - logits.max(-1, keepdims=True)
            logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
            total_loss += float(-logp[np.arange(len(labels)), labels].mean())
            outs.append(logits)
            labs.append(labels)
        outs = np.concatenate(outs)
        labs = np.concatenate(labs)
        return (
            total_loss,
            self.calculate_f1_score(outs, labs, "weighted"),
            self.calculate_f1_score(outs, labs, "macro"),
        )

    # ------------------------------------------------------------------

    def tuner(
        self,
        train_dataframe,
        validation_dataframe,
        test_dataframe=None,
        save_directory: str = "",
        batch_size: int = 4,
        epochs: int = 5,
        evaluation_steps: int = 500,
        num_workers: int = 4,
        accum_steps: int = 1,
    ):
        import pandas as pd

        train_ds = ImageLabelDataset(train_dataframe)
        valid_ds = ImageLabelDataset(validation_dataframe)
        num_batches_per_epoch = -(-len(train_ds) // batch_size)
        total_steps = num_batches_per_epoch * epochs
        schedule = cosine_lr(self.hyper_params["lr"], self.warmup, total_steps)
        opt = _make_optimizer(
            self.optimizer_name, schedule, self.hyper_params["weight_decay"]
        )
        if self.model_name.startswith("resnet"):
            opt = optax.multi_transform(
                {"train": opt, "buffer": optax.set_to_zero()},
                _bn_buffer_labels(self.params),
            )
        self.state = _TrainState(self.params, opt.init(self.params), jnp.zeros((), jnp.int32))

        forward = self._forward

        if accum_steps > 1:
            # per-sample CE is linear in the samples, so (unlike the
            # contrastive loss — see contrastive._accum_infonce_grads) exact
            # accumulation is just sum-the-grads-then-normalize: accumulate
            # per-microbatch masked loss SUMS and their grads under lax.scan,
            # divide once by the global valid count. BN running stats are
            # batch-coupled, so CNN backbones are gated off.
            if self.model_name.startswith("resnet"):
                raise ValueError(
                    "accum_steps > 1 is unsupported for BatchNorm backbones "
                    "(running stats are batch-coupled); use a ViT/CLIP "
                    "backbone or accum_steps=1"
                )
            if batch_size % accum_steps:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by accum_steps "
                    f"{accum_steps}"
                )

        @jax.jit
        def train_step(state: _TrainState, pixels, labels, n_valid):
            if accum_steps == 1:
                def loss_fn(params):
                    logits, bn_stats = forward(params, pixels, True)
                    per = optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels)
                    mask = (jnp.arange(len(labels)) < n_valid).astype(jnp.float32)
                    loss = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
                    return loss, bn_stats

                (loss, bn_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            else:
                k, B = accum_steps, pixels.shape[0]
                mb = B // k
                px = pixels.reshape(k, mb, *pixels.shape[1:])
                lb = labels.reshape(k, mb)
                offs = jnp.arange(k) * mb

                def loss_sum_fn(params, px_m, lb_m, off):
                    logits, _ = forward(params, px_m, True)
                    per = optax.softmax_cross_entropy_with_integer_labels(
                        logits, lb_m)
                    mask = (off + jnp.arange(mb) < n_valid).astype(jnp.float32)
                    return (per * mask).sum()

                def body(acc, xs):
                    ls, g = jax.value_and_grad(loss_sum_fn)(state.params, *xs)
                    return (
                        acc[0] + ls,
                        jax.tree.map(lambda a, b: a + b, acc[1], g),
                    ), None

                zero = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
                (loss_sum, grads), _ = jax.lax.scan(
                    body, (jnp.float32(0), zero), (px, lb, offs))
                cnt = jnp.maximum(
                    jnp.minimum(n_valid, B).astype(jnp.float32), 1.0)
                loss = loss_sum / cnt
                grads = jax.tree.map(lambda g: g / cnt, grads)
                bn_stats = None
            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if bn_stats is not None:
                # torch-buffer semantics: running stats update via EMA only —
                # the optimizer never touches them (masked out above).
                params = jres.merge_bn_stats(params, bn_stats)
            return _TrainState(params, opt_state, state.step + 1), loss

        self._eval_fn = jax.jit(lambda p, x: forward(p, x, False)[0])

        performance_df = pd.DataFrame(
            index=np.arange(epochs), columns=["epoch", "loss", "f1_weighted", "f1_macro"]
        )

        for epoch in range(epochs):
            train_loader = PrefetchLoader(
                train_ds, batch_size, num_workers=num_workers, device_put=False
            )
            for i, ((images, labels), n) in enumerate(train_loader):
                step = num_batches_per_epoch * epoch + i
                pixels = self._preprocess(images)
                self.state, loss = train_step(
                    self.state, pixels, jnp.asarray(np.asarray(labels), jnp.int32), n
                )
                self.logging.info(
                    f"[Train - this batch] epoch: {epoch}, batch: {i}, "
                    f"new learning rate: {float(schedule(step)):.3e}"
                )
                if evaluation_steps and step % evaluation_steps == 0:
                    vl, f1w, f1m = self.valid_evaluation(
                        PrefetchLoader(valid_ds, batch_size, num_workers=num_workers,
                                       device_put=False),
                        batch_size,
                    )
                    self.logging.info(
                        f"[Validation - this batch] epoch: {epoch}, batch: {i}, "
                        f"total loss: {vl}, f1_weighted: {f1w}, f1_macro: {f1m}"
                    )

            vl, f1w, f1m = self.valid_evaluation(
                PrefetchLoader(valid_ds, batch_size, num_workers=num_workers,
                               device_put=False),
                batch_size,
            )
            performance_df.loc[epoch, "epoch"] = epoch
            performance_df.loc[epoch, "loss"] = vl
            performance_df.loc[epoch, "f1_weighted"] = f1w
            performance_df.loc[epoch, "f1_macro"] = f1m
            if test_dataframe is not None:
                test_loader = PrefetchLoader(
                    ImageLabelDataset(test_dataframe), batch_size,
                    num_workers=num_workers, device_put=False,
                )
                _, f1tw, f1tm = self.valid_evaluation(test_loader, batch_size)
                performance_df.loc[epoch, "f1_test_weighted"] = f1tw
                performance_df.loc[epoch, "f1_test_macro"] = f1tm

        self.params = self.state.params
        performance_df["f1_weighted"] = performance_df["f1_weighted"].astype(float)
        performance_df["f1_macro"] = performance_df["f1_macro"].astype(float)
        return performance_df
