"""Real 2-process multi-host training test (VERDICT r2 #7).

Spawns two Python processes that jax.distributed.initialize against a local
coordinator on the CPU backend (2 virtual devices per process -> a 4-device
global dp mesh), run one contrastive train step where each process feeds only
its ``local_batch_slice`` of the global batch, and write a checkpoint through
the process-0-guarded ``save_train_state``. Asserts: both processes agree on
the global loss scalar, exactly one process wrote the checkpoint, and the
checkpoint resumes.

The reference has no distributed path at all (SURVEY.md §2.3); this pins the
pod semantics of ours.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["_PLIP_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from plip_tpu.parallel import distributed

pid = int(os.environ["_PLIP_PID"])
ok = distributed.initialize(
    coordinator_address=os.environ["_PLIP_COORD"], num_processes=2, process_id=pid
)
assert ok and jax.process_count() == 2, (ok, jax.process_count())

import jax.numpy as jnp
import numpy as np
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.parallel.distributed import local_batch_slice
from plip_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
from plip_tpu.train.contrastive import (
    init_train_state, load_train_state, make_optimizer, make_train_step,
    save_train_state,
)

cfg = CLIPConfig.tiny()
mesh = create_mesh(dp=len(jax.devices()), tp=1)
params = shard_params(jclip.init_params(jax.random.PRNGKey(0), cfg), mesh)
opt = make_optimizer(base_lr=1e-4, warmup=2, total_steps=10)
state = init_train_state(params, opt)
step = make_train_step(cfg, opt)

B = 8
rng = np.random.default_rng(0)  # same seed: both procs build the same GLOBAL batch
pixels = rng.standard_normal(
    (B, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
ids = np.zeros((B, cfg.text.context_length), np.int32)
ids[:, 0] = 1
ids[:, 1:4] = rng.integers(2, cfg.text.vocab_size - 2, (B, 3))
ids[:, 4] = cfg.text.eot

sl = local_batch_slice(B)  # each process contributes only its slice
bp, bi = shard_batch((pixels[sl], ids[sl]), mesh)
state, metrics = step(state, bp, bi)
loss = float(metrics["loss"])

ckpt = os.path.join(os.environ["_PLIP_TMP"], "mh_ckpt.npz")
save_train_state(ckpt, state, cfg)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpt_written")  # proc 0 finished writing

# resume must round-trip (loads on every process; file written by proc 0)
state2, _ = load_train_state(ckpt, opt)
assert int(state2.step) == 1

# orbax leg (VERDICT r4 #5): the per-process-shard-write path actually runs
# with process_count=2 — save from the sharded state, restore with a sharded
# params_like target, and verify the restored state CONTINUES identically:
# one more step from the restored state must produce the same loss as one
# more step from the live state (same batch, deterministic fp32 program).
from plip_tpu.train.contrastive import (
    load_train_state_orbax, save_train_state_orbax,
)

ockpt = os.path.join(os.environ["_PLIP_TMP"], "mh_ckpt.orbax")
save_train_state_orbax(ockpt, state, cfg)
multihost_utils.sync_global_devices("orbax_written")

pixels2 = rng.standard_normal(
    (B, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
bp2, bi2 = shard_batch((pixels2[sl], ids[sl]), mesh)
_, m_live = step(state, bp2, bi2)  # donates `state` — restore next
loss_live = float(m_live["loss"])

# fresh sharded placement target (the original `params` buffers were
# donated into the live state and consumed by its steps)
like = shard_params(jclip.init_params(jax.random.PRNGKey(0), cfg), mesh)
state3, cfg3 = load_train_state_orbax(ockpt, opt, params_like=like)
assert int(state3.step) == 1 and cfg3.embed_dim == cfg.embed_dim
_, m_res = step(state3, bp2, bi2)
loss_res = float(m_res["loss"])
assert abs(loss_live - loss_res) < 1e-6, (loss_live, loss_res)

print(f"MHRESULT pid={pid} loss={loss:.6f} loss2={loss_res:.6f} "
      f"wrote={os.path.exists(ckpt)}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            _PLIP_REPO=_REPO,
            _PLIP_PID=str(pid),
            _PLIP_COORD=coord,
            _PLIP_TMP=str(tmp_path),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=_REPO,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=570)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    losses, losses2 = [], []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHRESULT")][0]
        losses.append(float(line.split("loss=")[1].split()[0]))
        losses2.append(float(line.split("loss2=")[1].split()[0]))
    # the dp-sharded InfoNCE is GLOBAL: both processes see the same scalar
    assert np.isclose(losses[0], losses[1], rtol=1e-5), losses
    # ... including after the 2-process orbax save/restore round-trip
    assert np.isclose(losses2[0], losses2[1], rtol=1e-5), losses2
    # the guarded writer produced exactly one checkpoint pair
    assert os.path.exists(tmp_path / "mh_ckpt.npz")
    assert os.path.exists(tmp_path / "mh_ckpt.npz.opt.npz")
    # orbax checkpoint directory exists (per-process shard writes)
    assert os.path.isdir(tmp_path / "mh_ckpt.orbax")


_CHILD_ACCUM = r"""
import os, sys
sys.path.insert(0, os.environ["_PLIP_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from plip_tpu.parallel import distributed

pid = int(os.environ["_PLIP_PID"])
ok = distributed.initialize(
    coordinator_address=os.environ["_PLIP_COORD"], num_processes=2, process_id=pid
)
assert ok and jax.process_count() == 2, (ok, jax.process_count())

from types import SimpleNamespace

import numpy as np
import pandas as pd
from PIL import Image

import plip_tpu.train.clip_tuner as ct
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig
from plip_tpu.parallel.mesh import create_mesh
from plip_tpu.utils.checkpoint import save_checkpoint

mydir = os.path.join(os.environ["_PLIP_TMP"], f"proc{pid}")
os.makedirs(mydir, exist_ok=True)

cfg = CLIPConfig(
    vision=VisionConfig(width=32, layers=2, heads=2, image_size=224,
                        patch_size=32),
    text=TextConfig(width=32, layers=2, heads=2, vocab_size=49408,
                    context_length=77),
    embed_dim=16,
)
ckpt = os.path.join(mydir, "tiny.npz")
save_checkpoint(ckpt, jclip.init_params(jax.random.PRNGKey(3), cfg), cfg)

# identical synthetic data on both processes (same seed; lossless png)
rng = np.random.default_rng(0)
rows = []
for i in range(8):
    arr = rng.integers(0, 256, (240, 260, 3), dtype=np.uint8)
    p = os.path.join(mydir, f"im_{i}.png")
    Image.fromarray(arr).save(p)
    rows.append({"image": p, "caption": f"an H&E image of class {i % 2}"})
df = pd.DataFrame(rows)

# Inject a POST-EXECUTION RESOURCE_EXHAUSTED on process 0 ONLY at accum=1:
# the asymmetric case the coordinated protocol exists for. The step has run
# on both processes (so no process is stranded inside a collective) and then
# process 0's result fetch "fails"; the max-agreement must move BOTH
# processes to accum=2 before either re-enters the train program.
real_make = ct.make_train_step
built = []


def fake_make(cfg, opt, dtype=None, remat=False, accum_steps=1):
    built.append(accum_steps)
    step = real_make(cfg, opt, dtype=dtype, remat=remat,
                     accum_steps=accum_steps)

    def wrapped(state, px, ids):
        out = step(state, px, ids)
        if accum_steps < 2 and pid == 0:
            float(out[1]["loss"])  # program fully executed everywhere
            raise ValueError("RESOURCE_EXHAUSTED: (simulated post-exec)")
        return out

    return wrapped


ct.make_train_step = fake_make

mesh = create_mesh(dp=len(jax.devices()), tp=1)
records = []
t = ct.CLIPTuner(
    args=SimpleNamespace(first_resize=256, pxsize=224, optimizer="AdamW"),
    backbone=ckpt, lr=1e-4, warmup=2, accum_steps="auto", mesh=mesh,
)
t.logging = SimpleNamespace(
    info=lambda msg, *a: records.append(msg % a if a else msg),
    warning=lambda msg, *a: records.append(msg % a if a else msg),
)
t.tuner(df, df.iloc[:4], save_directory=mydir, batch_size=4, epochs=1,
        evaluation_steps=0, num_workers=2, start_time="aa")

assert built[:2] == [1, 2], built  # OOM at 1, every process rebuilt at 2
marker = "locally" if pid == 0 else "on a peer"
assert any(marker in r and "accum_steps=2" in r for r in records), records
losses = [
    float(r.rsplit("loss: ", 1)[1]) for r in records
    if "[Train - this batch]" in r
]
print("MHACCUM pid=%d built=%s losses=%s"
      % (pid, ",".join(map(str, built)),
         ",".join(f"{l:.6f}" for l in losses)))
"""


def test_two_process_coordinated_auto_accum(tmp_path):
    """accum_steps="auto" on a pod (VERDICT r4 #5): an OOM on ONE process
    must move EVERY process to the same accumulation factor via the
    agree_max_int collective — the non-OOM process discards its successful
    step and re-runs from the init stash, so both end on identical
    trajectories."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            _PLIP_REPO=_REPO,
            _PLIP_PID=str(pid),
            _PLIP_COORD=coord,
            _PLIP_TMP=str(tmp_path),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD_ACCUM],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=_REPO,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=570)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    parsed = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHACCUM")][0]
        pid = int(line.split("pid=")[1].split()[0])
        parsed[pid] = {
            "built": line.split("built=")[1].split()[0],
            "losses": [
                float(x) for x in line.split("losses=")[1].split(",")
            ],
        }
    assert set(parsed) == {0, 1}
    # both processes rebuilt 1 -> 2 (the succeeding process too)
    assert parsed[0]["built"].startswith("1,2"), parsed
    assert parsed[1]["built"].startswith("1,2"), parsed
    # identical global trajectories after the coordinated rebuild
    np.testing.assert_allclose(
        parsed[0]["losses"], parsed[1]["losses"], rtol=1e-5
    )
