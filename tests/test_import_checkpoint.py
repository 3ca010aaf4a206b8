"""End-to-end tests for the one-command asset importer
(plip_tpu/scripts/import_checkpoint.py): HF-naming and OpenAI-naming torch
dumps convert, verify against the torch black box, and emit golden fixtures
that the auto-discovery test (test_golden_embeddings.py) validates."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from plip_tpu.scripts.import_checkpoint import main  # noqa: E402

# widths must be 64-multiples: the converters infer heads as width//64 from a
# bare state_dict (the real CLIP family always has head_dim 64)
TINY_HF_CFG = dict(
    text_config=dict(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=1,
        vocab_size=49408, max_position_embeddings=77, intermediate_size=256,
        hidden_act="quick_gelu",
    ),
    vision_config=dict(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        image_size=32, patch_size=16, intermediate_size=512,
        hidden_act="quick_gelu",
    ),
    projection_dim=24,
)


@pytest.fixture(scope="module")
def tiny_hf_state_dict():
    torch.manual_seed(7)
    model = transformers.CLIPModel(transformers.CLIPConfig(**TINY_HF_CFG)).eval()
    return model.state_dict()


def test_import_hf_naming(tiny_hf_state_dict, tmp_path):
    weights = str(tmp_path / "pytorch_model.bin")
    torch.save(tiny_hf_state_dict, weights)
    out = str(tmp_path / "imported")
    summary = main([weights, "--out", out])
    assert summary["verified"]
    assert summary["min_cosine_image"] > 0.999
    assert summary["min_cosine_text"] > 0.999
    assert os.path.exists(os.path.join(out, "model.npz"))
    assert os.path.exists(os.path.join(out, "model.golden.npz"))


def test_import_openai_naming(tiny_hf_state_dict, tmp_path):
    from plip_tpu.utils.checkpoint import hf_sd_to_openai_sd

    oa_sd = {k: torch.as_tensor(v) for k, v in
             hf_sd_to_openai_sd(tiny_hf_state_dict).items()}
    weights = str(tmp_path / "plip_openai.pt")
    torch.save(oa_sd, weights)
    out = str(tmp_path / "imported_oa")
    summary = main([weights, "--out", out])
    assert summary["verified"]
    assert summary["min_cosine_image"] > 0.999
    assert summary["min_cosine_text"] > 0.999


def test_openai_hf_rekey_roundtrip(tiny_hf_state_dict):
    from plip_tpu.utils.checkpoint import hf_sd_to_openai_sd, openai_sd_to_hf_sd

    back = openai_sd_to_hf_sd(hf_sd_to_openai_sd(tiny_hf_state_dict))
    orig = {k: np.asarray(v) for k, v in tiny_hf_state_dict.items()
            if "position_ids" not in k}
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k], orig[k], err_msg=k)


def test_fidelity_gate_fires(tiny_hf_state_dict, tmp_path):
    """The cosine gate must actually be enforced. (A corrupted dump is
    self-consistent — both our conversion and the torch reference read the
    same file — so the honest way to test the gate is an unreachable
    threshold.)"""
    weights = str(tmp_path / "ok.bin")
    torch.save(tiny_hf_state_dict, weights)
    with pytest.raises(AssertionError, match="fidelity"):
        main([weights, "--out", str(tmp_path / "x"), "--threshold", "1.1"])


def test_import_with_vocab_asset(tiny_hf_state_dict, tmp_path):
    from plip_tpu.tokenizer import save_hf_format, synthetic_vocab

    tok = synthetic_vocab()  # 49408 tokens — matches the tiny model's table
    vocab_dir = str(tmp_path / "vocab")
    save_hf_format(tok, vocab_dir)
    weights = str(tmp_path / "w.bin")
    torch.save(tiny_hf_state_dict, weights)
    out = str(tmp_path / "imported_v")
    summary = main([weights, "--vocab", vocab_dir, "--out", out])
    assert summary["vocab"] is not None
    golden = np.load(os.path.join(out, "model.golden.npz"), allow_pickle=False)
    # probe ids came from the real tokenizer: EOT id present in every row
    assert (golden["input_ids"] == tok.eot_token).any(axis=1).all()


def test_import_vocab_size_mismatch_rejected(tiny_hf_state_dict, tmp_path):
    from plip_tpu.tokenizer import save_hf_format, synthetic_vocab

    tok = synthetic_vocab(total_size=49000)  # wrong table size
    vocab_dir = str(tmp_path / "vocab_bad")
    save_hf_format(tok, vocab_dir)
    weights = str(tmp_path / "w2.bin")
    torch.save(tiny_hf_state_dict, weights)
    with pytest.raises(ValueError, match="vocab size"):
        main([weights, "--vocab", vocab_dir, "--out", str(tmp_path / "y")])


def test_golden_fixture_discovered_and_passes(tiny_hf_state_dict, tmp_path,
                                              monkeypatch):
    weights = str(tmp_path / "w3.bin")
    torch.save(tiny_hf_state_dict, weights)
    out = str(tmp_path / "golden_dir")
    main([weights, "--out", out])
    from tests.test_golden_embeddings import _fixture_files, _check_fixture

    monkeypatch.setenv("PLIP_TPU_GOLDEN_DIR", out)
    files = _fixture_files()
    assert any(f.startswith(out) for f in files)
    for f in files:
        _check_fixture(f)
