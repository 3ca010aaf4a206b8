"""Device-mesh creation and sharding rules.

The reference is strictly single-process/single-device (SURVEY.md §2.3); this
module is the TPU-native scale-out layer it lacks: a named ``Mesh`` with
``dp`` (data) and ``tp`` (tensor) axes, NamedSharding trees for params and
batches, and helpers to place both. XLA/GSPMD inserts the collectives
(all-gathers for the contrastive logits, psums for tp matmuls) from these
annotations — no hand-written NCCL-style communication, per the scaling-book
recipe.

Sharding layout:
- batch dims           -> ``dp``
- MLP fc1 out / fc2 in -> ``tp`` (Megatron-style pair: XLA derives one
                           reduce-scatter/all-reduce per block)
- attention qkv out / out-proj in -> ``tp`` (head-parallel; widths are
                           multiples of 64·tp for every supported arch)
- embeddings/vocab     -> ``tp`` on the vocab axis (embedding lookup gathers)
- everything else      -> replicated
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def create_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh. dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _block_specs() -> Params:
    """PartitionSpecs for one (layer-stacked) transformer block.

    Leading axis is the scan/layer axis — never sharded.
    """
    return {
        "ln1": {"scale": P(), "bias": P()},
        "attn": {
            "qkv": {"kernel": P(None, None, "tp"), "bias": P(None, "tp")},
            "out": {"kernel": P(None, "tp", None), "bias": P()},
        },
        "ln2": {"scale": P(), "bias": P()},
        "mlp": {
            "fc1": {"kernel": P(None, None, "tp"), "bias": P(None, "tp")},
            "fc2": {"kernel": P(None, "tp", None), "bias": P()},
        },
    }


def param_specs() -> Params:
    """PartitionSpec tree matching models.clip.init_params structure."""
    return {
        "visual": {
            "patch_embed": {"kernel": P()},
            "class_embedding": P(),
            "pos_embed": P(),
            "ln_pre": {"scale": P(), "bias": P()},
            "blocks": _block_specs(),
            "ln_post": {"scale": P(), "bias": P()},
            "proj": {"kernel": P()},
        },
        "text": {
            "token_embed": P("tp", None),
            "pos_embed": P(),
            "blocks": _block_specs(),
            "ln_final": {"scale": P(), "bias": P()},
            "proj": {"kernel": P()},
        },
        "logit_scale": P(),
    }


def param_shardings(mesh: Mesh) -> Params:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def shard_params(params: Params, mesh: Mesh) -> Params:
    return jax.device_put(params, param_shardings(mesh))


def shard_batch(batch, mesh: Mesh):
    """Place a batch tree with the leading dim sharded over ``dp``.

    Single-process: a plain device_put. Multi-process (pods): each process
    passes only its LOCAL slice of the global batch (see
    ``distributed.local_batch_slice``) and the global array is assembled
    from the per-process shards — data never leaves the host that loaded it.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
