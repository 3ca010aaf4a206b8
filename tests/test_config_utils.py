"""PC_* config plumbing tests."""

import os

import pytest

from plip_tpu.utils.config import PCConfig, load_dotenv_file


def test_pcconfig_roundtrip(monkeypatch):
    for k in ["PC_CACHE_FOLDER", "PC_RESULTS_FOLDER",
              "PC_EVALUATION_DATA_ROOT_FOLDER", "PC_CLIP_ARCH",
              "PC_DEFAULT_BACKBONE"]:
        monkeypatch.delenv(k, raising=False)
    cfg = PCConfig(cache_folder="/c", results_folder="/r",
                   evaluation_data_root_folder="/d", clip_arch="ViT-B/16",
                   default_backbone="/b.npz")
    cfg.export_env()
    cfg2 = PCConfig.from_env()
    assert cfg2 == cfg


def test_load_dotenv_file(tmp_path, monkeypatch):
    monkeypatch.delenv("PC_CLIP_ARCH", raising=False)
    monkeypatch.setenv("PC_CACHE_FOLDER", "/existing")
    env = tmp_path / "config.env"
    env.write_text(
        "# comment\n"
        "PC_CLIP_ARCH=ViT-B/32\n"
        'PC_CACHE_FOLDER="/from_file"\n'
        "malformed line without equals? no: skip\n"
    )
    load_dotenv_file(str(env))
    assert os.environ["PC_CLIP_ARCH"] == "ViT-B/32"
    # existing env wins (dotenv override=False semantics)
    assert os.environ["PC_CACHE_FOLDER"] == "/existing"


def test_load_dotenv_missing_file_noop():
    load_dotenv_file("/nonexistent/config.env")  # must not raise
