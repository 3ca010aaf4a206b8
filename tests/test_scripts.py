"""End-to-end CLI script tests against a synthetic mini-dataset, exercising
the BASELINE configs 3–4 shapes (zero-shot suite, linear probing, retrieval,
fine-tuning HPO)."""

import os

import numpy as np
import pytest

import jax

pd = pytest.importorskip("pandas")

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig
from plip_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("repro")
    (root / "cache").mkdir()
    (root / "results").mkdir()
    (root / "data").mkdir()

    # tiny checkpoint as the default backbone
    cfg = CLIPConfig(
        vision=VisionConfig(width=32, layers=2, heads=2, image_size=224, patch_size=32),
        text=TextConfig(width=32, layers=2, heads=2, vocab_size=49408, context_length=77),
        embed_dim=16,
    )
    params = jclip.init_params(jax.random.PRNGKey(5), cfg)
    ckpt = str(root / "plip_tiny.npz")
    save_checkpoint(ckpt, params, cfg)

    # synthetic dataset: 12 tiles, 2 classes
    from PIL import Image

    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        label = ["benign", "malignant"][i % 2]
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = str(root / "data" / f"tile_{i}.png")
        Image.fromarray(arr).save(p)
        rows.append(
            {
                "image": p,
                "label": label,
                "text_style_4": f"An H&E image patch of {label}.",
            }
        )
    df = pd.DataFrame(rows)
    df.iloc[:8].to_csv(root / "data" / "minikather_train.csv", index=False)
    df.iloc[8:].to_csv(root / "data" / "minikather_test.csv", index=False)

    # retrieval tsv
    rdf = pd.DataFrame(
        {"images": df["image"], "captions": df["text_style_4"]}
    )
    rdf.to_csv(root / "data" / "minikather_retrieval.tsv", sep="\t", index=False)

    env_vars = {
        "PC_CACHE_FOLDER": str(root / "cache"),
        "PC_RESULTS_FOLDER": str(root / "results"),
        "PC_EVALUATION_DATA_ROOT_FOLDER": str(root / "data"),
        "PC_CLIP_ARCH": "ViT-B/32",
        "PC_DEFAULT_BACKBONE": ckpt,
        "PC_DOTENV": str(root / "nonexistent.env"),
    }
    return root, env_vars


@pytest.fixture(autouse=True)
def set_env(env, monkeypatch):
    _, env_vars = env
    for k, v in env_vars.items():
        monkeypatch.setenv(k, v)


def test_zero_shot_script(env):
    from plip_tpu.scripts.zero_shot_evaluation import main

    root, _ = env
    results = main(["--dataset", "minikather"])
    assert results[1]["split"] == "test"
    out = root / "results" / "extended_results_zero_shot_minikather.csv"
    assert out.exists()
    df = pd.read_csv(out, index_col=0)
    assert {"Accuracy", "WF1", "dataset", "model", "backbone"} <= set(df.columns)


def test_linear_probing_script(env):
    from plip_tpu.scripts.linear_probing_evaluation import main

    root, _ = env
    main(["--dataset", "minikather", "--alpha", "0.01"])
    out = root / "results" / "extended_results_linear_probing_minikather.csv"
    assert out.exists()
    # per-run CSV layout
    per_run = (
        root / "results" / "minikather" / "plip" / "seed=1" / "alpha=0.01"
        / "plip_tiny.npz.csv"
    )
    assert per_run.exists()
    perf = pd.read_csv(per_run, index_col=0)
    assert len(perf) == 2  # train + test rows


def test_retrieval_script(env):
    from plip_tpu.scripts.retrieval_evaluation import main

    root, _ = env
    results = main(["--dataset", "minikather"])
    assert 0.0 <= results[1]["p@10"] <= 1.0
    out = root / "results" / "extended_results_retrieval_minikather.csv"
    assert out.exists()


def test_embedding_cache_reused_across_scripts(env):
    """Second run hits the cache (same additional_cache_name + backbone)."""
    from plip_tpu.scripts.zero_shot_evaluation import main

    root, _ = env
    cache_dir = root / "cache" / "minikather_test" / "plip"
    before = {f: os.path.getmtime(cache_dir / f) for f in os.listdir(cache_dir)}
    main(["--dataset", "minikather"])
    after = {f: os.path.getmtime(cache_dir / f) for f in os.listdir(cache_dir)}
    assert before == after  # untouched -> cache hit


def test_fine_tuning_train_script(env, tmp_path):
    from plip_tpu.scripts.fine_tuning_train import main

    root, _ = env
    # Kather label digitization requires Kather-style labels; use PanNuke-style
    # int labels under the 'PanNuke' dataset name instead.
    df_tr = pd.read_csv(root / "data" / "minikather_train.csv")
    df_te = pd.read_csv(root / "data" / "minikather_test.csv")
    for df, name in [(df_tr, "PanNuke_train.csv"), (df_te, "PanNuke_test.csv")]:
        d = df.copy()
        d["label"] = (d["label"] == "malignant").astype(int)
        d.to_csv(root / "data" / name, index=False)

    perf = main(
        [
            "--dataset", "PanNuke",
            "--model_name", "plip",
            "--batch-size", "4",
            "--epochs", "1",
            "--num_workers", "2",
            "--save_directory", str(tmp_path / "ft"),
            "--lr_search", "1e-4", "1e-3",
        ]
    )
    assert perf is not None
    assert "f1_weighted" in perf.columns
    # outputs on disk
    runs = list((tmp_path / "ft").rglob("performance_test_best_lr=*.tsv"))
    assert len(runs) == 1
    assert list((tmp_path / "ft").rglob("arguments.csv"))
    assert list((tmp_path / "ft").rglob("performance_val.tsv"))

    # skip-if-done guard: second invocation exits early
    perf2 = main(
        [
            "--dataset", "PanNuke",
            "--model_name", "plip",
            "--batch-size", "4",
            "--epochs", "1",
            "--save_directory", str(tmp_path / "ft"),
            "--lr_search", "1e-4",
        ]
    )
    assert perf2 is None


def test_fine_tuning_analysis_script(env, tmp_path):
    """Harvest a synthetic results tree."""
    from plip_tpu.scripts.fine_tuning_analysis import main

    base = tmp_path / "fa"
    run = (
        base / "PanNuke" / "train_ratio=1.0"
        / "PLIP_btch=128_wd=0.1_nepochs=10_validratio=0.3_optimizer=AdamW"
        / "random_seed=0_20260101-00.00.00"
    )
    run.mkdir(parents=True)
    pd.DataFrame(
        {"epoch": [0, 1], "f1_weighted": [0.5, 0.7], "f1_macro": [0.4, 0.6]}
    ).to_csv(run / "performance_test_best_lr=0.001.tsv", sep="\t")
    out = main(["--save_directory", str(base), "--models", "plip", "--num_seeds", "2"])
    val = out.loc["plip", ("PanNuke", 1)]
    assert val.startswith("0.700")
    assert (base / "__figures" / "perf_mean.csv").exists()


def test_extract_embedding_script(env):
    from plip_tpu.scripts.extract_embedding import main

    root, _ = env
    # eval-style dataset CSV named {dataset}.csv with caption column
    df = pd.read_csv(root / "data" / "minikather_test.csv")
    df.to_csv(root / "data" / "Kather_mini.csv")
    savepath = main(["--dataset", "Kather_mini", "--batch-size", "4"])
    for suffix in [
        "_image_embeddings.npy",
        "_text_embeddings.npy",
        "_image_embeddings_normalized.npy",
        "_embeddings_normalized.npy",
    ]:
        assert os.path.exists(os.path.join(savepath, "Kather_mini" + suffix))
    emb = np.load(os.path.join(savepath, "Kather_mini_image_embeddings_normalized.npy"))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
