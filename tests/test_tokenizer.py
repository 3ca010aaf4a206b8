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

# NOTE: CJK text and raw HTML entities are absent from SAMPLES because those
# comparisons run against HF *without* ftfy (BasicTokenizer fallback:
# whitespace-splits CJK, no html.unescape). The canonical OpenAI (ftfy) path —
# which the PLIP checkpoint was trained with and which we implement via the
# vendored textfix.fix_text — is covered separately below by forcing HF onto
# its ftfy code path (monkeypatched fix_text) and fuzzing CJK/HTML/mojibake.
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


def test_openai_merges_slice_matches_simple_tokenizer(tmp_path):
    """The real ``bpe_simple_vocab_16e6.txt.gz`` holds more merge lines than
    the tokenizer consumes; OpenAI's simple_tokenizer slices to exactly 48894
    merges. An over-wide slice silently overflows the 49408-row embedding
    table and shifts the EOT id (ADVICE r1, high)."""
    from plip_tpu.tokenizer.vocab import OPENAI_MERGE_COUNT

    lines = ["#version: fake"] + [f"x{i} y{i}" for i in range(49_300)]
    path = tmp_path / "merges.txt"
    path.write_text("\n".join(lines))
    tok = load_openai_bpe(str(path))
    assert OPENAI_MERGE_COUNT == 48894
    assert len(tok.bpe_ranks) == OPENAI_MERGE_COUNT
    assert tok.vocab_size == CLIP_VOCAB_SIZE
    assert tok.eot_token == CLIP_VOCAB_SIZE - 1


def test_determinism():
    a = synthetic_vocab()
    b = synthetic_vocab()
    assert a.encoder == b.encoder
    assert a.bpe_ranks == b.bpe_ranks


def test_fuzz_canonical_path_cjk_html_mojibake(tokenizer, tmp_path):
    """Fuzz the previously-skipped classes (CJK, HTML entities, mojibake,
    curly quotes, fullwidth forms) against HF CLIPTokenizer forced onto its
    *ftfy* code path: with ``hf.fix_text`` set, HF runs
    ``whitespace_clean(fix_text(t)).lower()`` + the shared regex/BPE — exactly
    our pipeline. Monkeypatching it to our ``basic_clean`` (vendored
    textfix.fix_text + double html.unescape + strip) therefore checks the
    whole canonical tokenization end-to-end on these inputs."""
    transformers = pytest.importorskip("transformers")
    import random

    from plip_tpu.tokenizer.bpe import basic_clean

    vocab_path, merges_path = save_hf_format(tokenizer, tmp_path)
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)
    hf.fix_text = basic_clean
    rng = random.Random(1)
    alphabet = "abcdefghij xyz;# 病理組織学的乳腺肺癌腫瘍良性悪性中文字“”‘’ﬁＡＢ１。、，"
    pieces = ["&amp;", "&lt;", "H&amp;E", "schÃ¶n", "naÃ¯ve", "café", "â€œqâ€\x9d"]
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(rng.randint(0, 2)):
            s += " " + rng.choice(pieces)
        ours = tokenizer.encode(s)
        theirs = hf(s, add_special_tokens=False)["input_ids"]
        assert ours == theirs, repr(s)


def test_cjk_not_whitespace_split(tokenizer):
    """Canonical (ftfy-path) semantics: a CJK run is ONE regex token — merges
    may cross character boundaries and only the final byte takes ``</w>``.
    (HF without ftfy diverges by design: its BasicTokenizer space-splits every
    CJK char; the checkpoint was not trained that way.)"""
    from plip_tpu.tokenizer.bpe import bytes_to_unicode

    text = "病理組織"
    be = bytes_to_unicode()
    mapped = "".join(be[b] for b in text.encode("utf-8"))
    # synthetic vocab trains on ASCII only -> no merges apply to CJK bytes
    expected = [tokenizer.encoder[t] for t in mapped[:-1]]
    expected.append(tokenizer.encoder[mapped[-1] + "</w>"])
    assert tokenizer.encode(text) == expected


def test_textfix_golden_equivalences(tokenizer):
    """Vendored fix_text heals inputs to tokenize identically to clean text."""
    pairs = [
        ("An H&amp;E image of schÃ¶n tissue", "An H&E image of schön tissue"),
        ("donâ€™t", "don't"),
        ("don’t", "don't"),
        ("ＡＢＣ １２３", "abc 123"),
        ("ﬁnal diagnosis", "final diagnosis"),
        ("café", "café"),  # NFC
        ("schÃƒÂ¶n", "schön"),  # double-encoded mojibake
    ]
    for src, clean in pairs:
        assert tokenizer.encode(src) == tokenizer.encode(clean), (src, clean)


def test_textfix_leaves_clean_text_alone():
    from plip_tpu.tokenizer.textfix import fix_text

    for s in ["café", "é", "naïve œuvre", "中文病理", "plain ascii 123",
              "àüñç é", "Привет мир", "καλημέρα", "don't \"quote\" me",
              "20% & 30%", "a&b", "R&D dept",
              # ADVICE r4: 2-letter spans whose cp1251 bytes form valid
              # UTF-8 are plausible real text — same-script flips
              # ("Рі"→"г") and letter→symbol flips ("Ві"→"³") must not fire
              "Рі", "Ві", "Сќ"]:
        assert fix_text(s) == s


def test_textfix_two_letter_cross_script_still_repairs():
    """The script guard must NOT block genuine 2-char mojibake: cp1251
    mis-decodes of Latin UTF-8 ("Гј"→"ü") are cross-script flips."""
    from plip_tpu.tokenizer.textfix import fix_text

    assert fix_text("fГјr") == "für"
    assert fix_text("schГ¶n") == "schön"  # mixed letter+symbol span, cp1251


def test_textfix_full_fixer_passes():
    """Round-4 widened passes (VERDICT r3 #6): HTML entities, terminal
    escapes, multi-codepage mojibake, C1 controls, surrogates, halfwidth
    katakana, control-char removal."""
    from plip_tpu.tokenizer.textfix import fix_text

    cases = [
        # html entities (semicolon-terminated; auto mode)
        ("&amp;", "&"), ("&#65;&#x42;", "AB"), ("&lt;tag&gt;", "<tag>"),
        # terminal escapes
        ("\x1b[31mred\x1b[0m", "red"), ("\x1b[1;32mok\x1b[m", "ok"),
        # mojibake through each supported codepage
        ("schÃ¶n", "schön"),                        # 1252
        ("Ã©lÃ¨ve", "élève"),                       # 1252
        ("√©l√®ve", "élève"),                       # macroman
        ("Ð¿Ñ€Ð¸Ð²ÐµÑ‚", "привет"),                # Cyrillic target
        ("â€œquotedâ€\x9d", '"quoted"'),            # quotes + C1 tail byte
        ("dÃ©jÃ\xa0 vu", "déjà vu"),                # NBSP continuation byte
        ("ç\x97\x85ç\x90\x86", "病理"),             # CJK target, C1 bytes
        ("schÃƒÂ¶n", "schön"),                      # double-encoded
        # stray C1 controls -> cp1252 (ftfy fix_c1_controls)
        ("caf\x82", "caf'"), ("x\x85y", "x…y"),
        # surrogate pairs combine; lone surrogates -> U+FFFD
        ("😀", "😀"), ("a\ud800b", "a�b"),
        # width: fullwidth ASCII, ideographic space, halfwidth katakana
        ("ＡＢ　Ｃ！", "AB C!"), ("ｶﾞｲﾄﾞ", "ガイド"), ("ﾊﾟｽ", "パス"),
        # control chars removed (ftfy table), \t\n\f\r kept
        ("a\x00b\x0bc\x7fd﻿e", "abcde"), ("a\tb\nc", "a\tb\nc"),
        # line separators
        ("a b c", "a\nb\nc"),
    ]
    for src, want in cases:
        assert fix_text(src) == want, (src, fix_text(src), want)


def test_textfix_mojibake_fuzz_roundtrip():
    """Fuzz: text encoded UTF-8 then mis-decoded through each supported
    codepage must repair exactly; repaired == original."""
    import random

    from plip_tpu.tokenizer.textfix import fix_text

    rng = random.Random(7)
    words = ["schön", "élève", "naïve", "œuvre", "病理", "привет", "für",
             "café", "niño", "señor", "über", "αίμα", "ткань"]
    codecs_ = ["cp1252", "latin-1", "cp1251", "mac_roman", "cp437"]
    checked = 0
    for _ in range(300):
        text = " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        enc = rng.choice(codecs_)
        try:
            broken = text.encode("utf-8").decode(enc)
        except UnicodeDecodeError:
            continue  # codepage can't even represent the bytes — skip
        fixed = fix_text(broken)
        import unicodedata

        assert fixed == unicodedata.normalize("NFC", fix_text(text)), (
            enc, text, broken, fixed)
        checked += 1
    assert checked > 150  # the fuzz actually exercised repairs


def test_textfix_differential_vs_real_ftfy():
    """Differential fuzz vs REAL ftfy (VERDICT r4 ask #7) — armed but
    dormant: ftfy is not installed in this image, so this skips here and
    fires automatically in any environment that has it (bpe.py already
    auto-prefers real ftfy at runtime). The corpus covers every textfix
    pass we claim equivalence for: mojibake through all five codepages
    (incl. double-encoding), HTML entities, C1 controls, surrogates,
    width folding, quotes/ligatures/line-breaks, control removal, NFC.
    Documented divergences (textfix.py module docstring) are excluded:
    byte-corrupted mojibake (restore_byte_a0 etc.) and ambiguous
    two-letter spans where ftfy's trained badness model decides."""
    ftfy = pytest.importorskip("ftfy")
    import random
    import unicodedata

    from plip_tpu.tokenizer.textfix import fix_text

    # deterministic corpus of constructs we claim to match
    fixed_cases = [
        "An H&amp;E image of schÃ¶n tissue", "donâ€™t", "don’t",
        "ＡＢＣ １２３", "ﬁnal diagnosis", "café", "schÃƒÂ¶n",
        "&#65;&#x42;", "&lt;tag&gt;", "\x1b[31mred\x1b[0m",
        "Ã©lÃ¨ve", "√©l√®ve", "Ð¿Ñ€Ð¸Ð²ÐµÑ‚", "â€œquotedâ€\x9d",
        "dÃ©jÃ\xa0 vu", "ç\x97\x85ç\x90\x86", "caf\x82", "x\x85y",
        "😀", "a\ud800b", "ＡＢ　Ｃ！", "ｶﾞｲﾄﾞ", "ﾊﾟｽ",
        "a\x00b\x0bc\x7fd﻿e", "a\tb\nc", "a b c",
        "plain ascii", "Привет мир", "καλημέρα", "中文病理",
    ]
    for s in fixed_cases:
        assert fix_text(s) == ftfy.fix_text(s), repr(s)

    # mojibake roundtrip fuzz — same generator as the offline fuzz above
    rng = random.Random(11)
    words = ["schön", "élève", "naïve", "œuvre", "病理", "привет", "für",
             "café", "niño", "señor", "über", "αίμα", "ткань"]
    codecs_ = ["cp1252", "latin-1", "cp1251", "mac_roman", "cp437"]
    checked = 0
    for _ in range(300):
        text = " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        enc = rng.choice(codecs_)
        try:
            broken = text.encode("utf-8").decode(enc)
        except UnicodeDecodeError:
            continue
        ours = fix_text(broken)
        theirs = unicodedata.normalize("NFC", ftfy.fix_text(broken))
        assert ours == theirs, (enc, text, broken, ours, theirs)
        checked += 1
    assert checked > 150


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
