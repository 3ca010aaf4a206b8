"""Profile the ViT-L/14 b64 train step on the axon TPU and print the
per-while (scan) decomposition + top ops — the same method that overturned
the B/32 backward attribution (CLAUDE.md round-3 findings). Then a one-process
A/B of backward modes / batch sizes can be aimed at the real hot spot."""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)


def main():
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 64
    outdir = f"/tmp/jaxtrace_l14_b{batch}"
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    opt = make_optimizer(total_steps=100)
    state = init_train_state(params, opt)
    step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)
    state, _ = step(state, px, ids)
    float(state.params["logit_scale"])
    print("warm done", flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, _ = step(state, px, ids)
        float(state.params["logit_scale"])
    print("trace done", flush=True)

    path = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"]["name"]
    dev = [e for e in ev if e.get("ph") == "X" and "dur" in e
           and names.get(e["pid"]) == "/device:TPU:0"]
    whiles = sorted((e for e in dev if e["name"].startswith("while.")),
                    key=lambda e: e["ts"])
    # NOTE: every occurrence of each while op accumulates (the traced run
    # has 3 steps); totals are normalized by /3e3 below — 3 steps, us->ms.
    per = collections.defaultdict(collections.Counter)
    for w in whiles:
        t0, t1 = w["ts"], w["ts"] + w["dur"]
        for e in dev:
            if e is w or e["tid"] != w["tid"]:
                continue
            if (e["ts"] >= t0 and e["ts"] + e["dur"] <= t1
                    and not e["name"].startswith("while.")):
                per[w["name"]][e["name"]] += e["dur"]
    tot_w = {}
    for w in whiles:
        tot_w.setdefault(w["name"], 0)
        tot_w[w["name"]] += w["dur"]
    step_tot = sum(e["dur"] for e in dev if e["name"].startswith("jit_step")) / 3e3
    print(f"step total: {step_tot:.1f} ms")
    for wn in sorted(tot_w):
        print(f"\n=== {wn}: {tot_w[wn]/3e3:.2f} ms/step ===")
        for n, d in per[wn].most_common(8):
            print(f"  {d/3e3:7.3f} ms/step  {n[:90]}")
    rest = sum(tot_w.values()) / 3e3
    print(f"\nwhiles sum {rest:.1f} ms; outside-scan {step_tot-rest:.1f} ms")


if __name__ == "__main__":
    main()
