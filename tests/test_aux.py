"""Aux subsystems: throughput meter, metric logger, train-state resume."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (
    init_train_state,
    load_train_state,
    make_optimizer,
    make_train_step,
    save_train_state,
)
from plip_tpu.utils.profiling import MetricLogger, ThroughputMeter, trace


def test_throughput_meter():
    m = ThroughputMeter()
    m.start()
    for _ in range(5):
        m.step(10)
    s = m.summary()
    assert s["total_items"] == 50
    assert s["items_per_sec"] > 0
    assert s["p95_latency_s"] >= s["p50_latency_s"]


def test_metric_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    ml = MetricLogger(path)
    ml.log(0, loss=1.5, lr=1e-4)
    ml.log(1, loss=jnp.asarray(1.2))
    ml.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["loss"] == 1.5
    assert abs(recs[1]["loss"] - 1.2) < 1e-6
    assert all("time_s" in r for r in recs)


def test_trace_noop():
    with trace() as info:
        _ = jnp.ones(4).sum()
    assert info["wall_time_s"] > 0


def test_train_state_resume(tmp_path):
    cfg = CLIPConfig.tiny()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(base_lr=1e-3, warmup=2, total_steps=20)
    step_fn = make_train_step(cfg, opt)
    state = init_train_state(params, opt)

    rng = np.random.default_rng(0)
    B = 4
    px = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)
    ids = np.zeros((B, cfg.text.context_length), np.int32)
    ids[:, 0] = 1
    ids[:, 1] = cfg.text.eot
    ids = jnp.asarray(ids)

    # 2 steps, save, 2 more steps -> reference trajectory
    for _ in range(2):
        state, _ = step_fn(state, px, ids)
    path = str(tmp_path / "ck.npz")
    save_train_state(path, state, cfg)
    ref = state
    for _ in range(2):
        ref, _ = step_fn(ref, px, ids)

    # resume from disk, 2 steps -> must match exactly
    resumed, cfg2 = load_train_state(path, opt)
    assert int(resumed.step) == 2
    for _ in range(2):
        resumed, _ = step_fn(resumed, px, ids)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_adamw_matches_optax():
    """fused_adamw (one tree_map pass) must be trajectory-identical to
    optax.adamw — same formulas, schedule stepping, and state leaves."""
    import optax

    from plip_tpu.train.contrastive import fused_adamw
    from plip_tpu.train.scheduler import cosine_lr

    sched = cosine_lr(1e-3, 2, 12)
    kw = dict(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.2)
    ours = fused_adamw(learning_rate=sched, **kw)
    ref = optax.adamw(learning_rate=sched, **kw)

    rng = np.random.default_rng(17)
    params = {
        "w": jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal(16).astype(np.float32)),
    }
    p_a, s_a = dict(params), ours.init(params)
    p_b, s_b = dict(params), ref.init(params)
    for step in range(6):
        g = jax.tree.map(
            lambda x: jnp.asarray(
                rng.standard_normal(x.shape).astype(np.float32)), params)
        u_a, s_a = ours.update(g, s_a, p_a)
        p_a = optax.apply_updates(p_a, u_a)
        u_b, s_b = ref.update(g, s_b, p_b)
        p_b = optax.apply_updates(p_b, u_b)
        for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7)
    # state carries the same adam moments
    np.testing.assert_allclose(np.asarray(s_a.mu["w"]),
                               np.asarray(s_b[0].mu["w"]), rtol=1e-6)


def test_parse_device_trace(tmp_path):
    """parse_device_trace decomposes a synthetic profiler trace: per-while
    groups with nested-op attribution, step normalization, outside-scan
    remainder, and logdir resolution."""
    import gzip

    from plip_tpu.utils.profiling import parse_device_trace

    # two steps: jit_step spans [0, 10000] and [20000, 30000] us; each has
    # one image-tower while (4000 us, with a fusion of 3000) and one
    # text-tower while (2000 us, with a fusion of 1500); other-thread and
    # other-device events must be ignored.
    ev = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "/host:CPU"}},
    ]
    for base in (0, 20000):
        ev += [
            {"ph": "X", "pid": 1, "tid": 1, "name": "jit_step",
             "ts": base, "dur": 10000},
            {"ph": "X", "pid": 1, "tid": 1, "name": "while.img",
             "ts": base + 100, "dur": 4000},
            {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.qkv",
             "ts": base + 200, "dur": 3000},
            {"ph": "X", "pid": 1, "tid": 1, "name": "while.txt",
             "ts": base + 5000, "dur": 2000},
            {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.mlp",
             "ts": base + 5100, "dur": 1500},
            # same window, different thread: not attributed
            {"ph": "X", "pid": 1, "tid": 9, "name": "fusion.other",
             "ts": base + 200, "dur": 999},
            # host event: ignored entirely
            {"ph": "X", "pid": 2, "tid": 1, "name": "decode",
             "ts": base, "dur": 8888},
        ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": ev}, f)

    dec = parse_device_trace(str(tmp_path), n_steps=2, step_prefix="jit_step")
    assert dec["step_total_ms"] == pytest.approx(10.0)
    assert dec["groups"]["while.img"]["total_ms"] == pytest.approx(4.0)
    assert dec["groups"]["while.txt"]["total_ms"] == pytest.approx(2.0)
    assert dec["groups"]["while.img"]["ops"] == [("fusion.qkv", pytest.approx(3.0))]
    assert dec["groups"]["while.txt"]["ops"] == [("fusion.mlp", pytest.approx(1.5))]
    assert dec["outside_ms"] == pytest.approx(4.0)
