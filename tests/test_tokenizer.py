"""Tokenizer exactness tests.

Algorithm-exactness is validated against HF's ``CLIPTokenizer`` loading the
*same* vocab/merges files we generate — this proves our from-scratch BPE is
bit-identical without needing the real (network-only) CLIP vocab asset.
"""

import numpy as np
import pytest

from plip_tpu.tokenizer import (
    CLIP_VOCAB_SIZE,
    DEFAULT_CONTEXT_LENGTH,
    load_hf_vocab,
    load_openai_bpe,
    save_hf_format,
    save_openai_format,
    synthetic_vocab,
)

SAMPLES = [
    "An H&E image patch of colorectal adenocarcinoma epithelium.",
    "a photo of benign tissue",
    "NUCLEI and mitotic figures!!!",
    "weird   spacing\tand\nnewlines",
    "unicode: naïve café 🔬",
    "numbers 123 and punctuation, e.g. (x-y) [z]",
    "don't stop; it's the model's output",
    "",
    "a" * 500,  # long input, must truncate
]

# NOTE: CJK text and raw HTML entities are deliberately absent from the
# samples. Without ftfy installed, HF's CLIPTokenizer falls back to a
# BasicTokenizer path that whitespace-splits CJK chars and skips the double
# html.unescape; the canonical OpenAI (ftfy) path — which the PLIP checkpoint
# was trained with and which we implement — splits nothing and unescapes.
HTML_SAMPLE = "An H&amp;E image of malignant breast tissue."


def test_html_unescape(tokenizer):
    # Canonical behavior: '&amp;' collapses to '&' before BPE.
    assert tokenizer.encode(HTML_SAMPLE) == tokenizer.encode(
        "An H&E image of malignant breast tissue."
    )


def test_vocab_size(tokenizer):
    assert tokenizer.vocab_size == CLIP_VOCAB_SIZE


def test_static_shapes(tokenizer):
    ids = tokenizer.tokenize(SAMPLES)
    assert ids.shape == (len(SAMPLES), DEFAULT_CONTEXT_LENGTH)
    assert ids.dtype == np.int32


def test_framing(tokenizer):
    ids = tokenizer.tokenize(["benign tissue"])[0]
    assert ids[0] == tokenizer.sot_token
    eot_pos = int(np.argmax(ids == tokenizer.eot_token))
    assert eot_pos > 1
    assert (ids[eot_pos + 1 :] == 0).all()


def test_truncation(tokenizer):
    ids = tokenizer.tokenize(["a " * 300])[0]
    assert ids[-1] == tokenizer.eot_token
    assert ids[0] == tokenizer.sot_token
    with pytest.raises(RuntimeError):
        tokenizer.tokenize(["a " * 300], truncate=False)


def test_roundtrip_decode(tokenizer):
    text = "an image patch of tumor tissue"
    ids = tokenizer.encode(text)
    assert tokenizer.decode(ids).strip() == text


def test_matches_hf_cliptokenizer(tokenizer, tmp_path):
    """Our BPE must be id-for-id identical to HF CLIPTokenizer on shared vocab."""
    transformers = pytest.importorskip("transformers")
    vocab_path, merges_path = save_hf_format(tokenizer, tmp_path)
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)
    for text in SAMPLES:
        ours = tokenizer.encode(text)
        theirs = hf(text, add_special_tokens=False)["input_ids"]
        assert ours == theirs, f"mismatch on {text!r}: {ours} vs {theirs}"


def test_matches_hf_padded_batch(tokenizer, tmp_path):
    """Full padded-batch parity with the HF processor path (plip.py:57-58).

    HF pads with its pad token while OpenAI pads with 0; ids up to and
    including EOT must agree — that's all the (causal, EOT-pooled) text tower
    consumes.
    """
    transformers = pytest.importorskip("transformers")
    vocab_path, merges_path = save_hf_format(tokenizer, tmp_path)
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)
    theirs = hf(
        list(SAMPLES), max_length=77, padding="max_length", truncation=True,
        return_tensors="np",
    )["input_ids"]
    ours = tokenizer.tokenize(SAMPLES)
    for row in range(len(SAMPLES)):
        eot = int(np.argmax(ours[row] == tokenizer.eot_token))
        assert (ours[row, : eot + 1] == theirs[row, : eot + 1]).all()


def test_openai_format_roundtrip(tokenizer, tmp_path):
    path = save_openai_format(tokenizer, str(tmp_path / "merges.txt.gz"))
    reloaded = load_openai_bpe(path)
    # The OpenAI derivation orders merge tokens before SOT/EOT and has no
    # filler; token *strings* per merge are identical, so encodings of real
    # text agree after mapping through the string space.
    for text in SAMPLES:
        a = [tokenizer.decoder[i] for i in tokenizer.encode(text)]
        b = [reloaded.decoder[i] for i in reloaded.encode(text)]
        assert a == b


def test_hf_format_roundtrip(tokenizer, tmp_path):
    vocab_path, merges_path = save_hf_format(tokenizer, tmp_path)
    reloaded = load_hf_vocab(vocab_path, merges_path)
    for text in SAMPLES:
        assert tokenizer.encode(text) == reloaded.encode(text)


def test_determinism():
    a = synthetic_vocab()
    b = synthetic_vocab()
    assert a.encoder == b.encoder
    assert a.bpe_ranks == b.bpe_ranks


def test_fuzz_matches_hf(tokenizer, tmp_path):
    """Randomized ASCII/latin fuzzing against HF CLIPTokenizer on shared
    vocab (CJK/html excluded per the documented ftfy-path difference)."""
    transformers = pytest.importorskip("transformers")
    import random

    vocab_path, merges_path = save_hf_format(tokenizer, tmp_path)
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)
    rng = random.Random(0)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " .,;:!?()[]{}'\"-_/\\@#$%^*+=<>|~`\t\n éàüñç"
    )
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        if "&" in s:  # html-unescape path differs without ftfy
            continue
        ours = tokenizer.encode(s)
        theirs = hf(s, add_special_tokens=False)["input_ids"]
        assert ours == theirs, repr(s)
