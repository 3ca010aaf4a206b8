"""Reference-import compatibility: the module paths reference-era code uses
must resolve to working implementations."""

import importlib

import pytest


def test_plip_module():
    from plip import PLIP
    from plip_tpu.api import PLIP as Real

    assert PLIP is Real


@pytest.mark.parametrize(
    "module,symbol",
    [
        ("reproducibility.metrics", "eval_metrics"),
        ("reproducibility.metrics", "retrieval_metrics"),
        ("reproducibility.embedders.abst", "AbstractEmbedder"),
        ("reproducibility.embedders.factory", "EmbedderFactory"),
        ("reproducibility.embedders.plip", "CLIPEmbedder"),
        ("reproducibility.embedders.mudipath", "DenseNetEmbedder"),
        ("reproducibility.embedders.mudipath", "build_densenet"),
        ("reproducibility.embedders.internal_datasets", "CLIPImageDataset"),
        ("reproducibility.embedders.internal_datasets", "CLIPImageCaptioningDataset"),
        ("reproducibility.embedders.transform", "_transform"),
        ("reproducibility.embedders.transform", "_train_transform"),
        ("reproducibility.embedders.scheduler", "cosine_lr"),
        ("reproducibility.evaluation.zero_shot.zero_shot", "ZeroShotClassifier"),
        ("reproducibility.evaluation.linear_probing.linear_classifier", "LinearProber"),
        ("reproducibility.evaluation.retrieval.retrieval", "ImageRetrieval"),
        ("reproducibility.evaluation.fine_tuning.fine_tuning_classifier", "FineTuner"),
        ("reproducibility.training_model.clip", "CLIPTuner"),
        ("reproducibility.training_model.clip", "zero_shot_classification"),
        ("reproducibility.fine_tuning.finetune", "FineTuner"),
        ("reproducibility.fine_tuning.finetune", "LinearClassifier"),
        ("reproducibility.utils.cacher", "cache_hit_or_miss"),
        ("reproducibility.utils.results_handler", "ResultsHandler"),
        ("reproducibility.scripts.zero_shot_evaluation", "main"),
        ("reproducibility.scripts.linear_probing_evaluation", "main"),
        ("reproducibility.scripts.retrieval_evaluation", "main"),
        ("reproducibility.scripts.fine_tuning_train", "main"),
        ("reproducibility.scripts.fine_tuning_analysis", "main"),
        ("reproducibility.scripts.extract_embedding", "main"),
        ("reproducibility.generate_validation_datasets._dataset_loader",
         "process_Kather_csv"),
        ("reproducibility.generate_validation_datasets._dataset_loader",
         "process_DigestPath"),
        ("reproducibility.generate_validation_datasets.prepare_dataset_to_csv",
         "parmap"),
        ("reproducibility.generate_validation_datasets.prepare_dataset_to_csv",
         "resizeimg"),
        ("reproducibility.generate_validation_datasets.preprocess"
         ".preprocess_DigestPath", "run_step_1"),
        ("reproducibility.generate_validation_datasets.preprocess"
         ".preprocess_PanNuke", "main"),
    ],
)
def test_reference_import_paths(module, symbol):
    mod = importlib.import_module(module)
    assert hasattr(mod, symbol), f"{module}.{symbol} missing"


def test_reference_flow_through_alias(tmp_path, monkeypatch):
    """A reference-shaped snippet runs against the alias package."""
    import numpy as np

    monkeypatch.setenv("PC_CACHE_FOLDER", str(tmp_path))
    from reproducibility.evaluation.zero_shot.zero_shot import ZeroShotClassifier
    from reproducibility.metrics import eval_metrics

    rng = np.random.default_rng(0)
    txt = rng.standard_normal((2, 8))
    img = txt[[0, 1, 0]]
    zs = ZeroShotClassifier()
    train_m, test_m = zs.zero_shot_classification(img, txt, ["a", "b"], ["a", "b", "a"])
    assert test_m["Accuracy"] == 1.0
