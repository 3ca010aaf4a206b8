"""Minimal deterministic ``ftfy.fix_text`` equivalent (vendored, no deps).

Why this exists: the checkpoint's training-time tokenization runs
``ftfy.fix_text`` on every caption via ``clip.tokenize``
(`/root/reference/reproducibility/embedders/plip.py:65` →
``clip.simple_tokenizer.basic_clean``). ftfy is a large heuristic library that
is not installed in offline environments; without it, mojibake/fullwidth/curly
inputs tokenize differently than the checkpoint was trained with. This module
vendors the deterministic core of ftfy's default pipeline:

1. **Mojibake repair** — UTF-8 byte sequences mis-decoded as windows-1252 or
   latin-1 (``"schÃ¶n"`` → ``"schön"``, ``"â€œxâ€\x9d"`` → ``"“x”"``), applied
   iteratively so double-encoded text also heals. Uses the *sloppy-1252*
   convention (undefined cp1252 bytes pass through as their C1 codepoints),
   same as ftfy's ``sloppy-windows-1252`` codec.
2. **Curly quotes → ASCII** (ftfy ``uncurl_quotes`` default).
3. **Latin ligatures → letter pairs** (ftfy ``fix_latin_ligatures`` default).
4. **Unicode line/paragraph separators → newline** (``fix_line_breaks``).
5. **Fullwidth forms → halfwidth** for the ASCII range + ideographic space
   (the part of ``fix_character_width`` that affects captions).
6. **NFC normalization** (ftfy's default ``normalization="NFC"``).

Documented divergences from real ftfy (each conservative — plain text is
never altered): HTML unescape is the caller's job (``basic_clean`` double-
unescapes, matching OpenAI clip); no terminal-escape/control-char stripping;
no half-width-katakana widening; the mojibake acceptance rule is "strictly
fewer non-ASCII characters after decode" instead of ftfy's trained badness
model, so ambiguous single-character cases (``"é"``, ``"café"``) always pass
through unchanged.
"""

from __future__ import annotations

import re
import unicodedata

# --- translation table: quotes, ligatures, line breaks, width -------------

_QUOTES = {
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"',
    "′": "'", "″": '"',
}
_LIGATURES = {
    "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl",
    "ﬃ": "ffi", "ﬄ": "ffl", "ﬅ": "st", "ﬆ": "st",
    "Ĳ": "IJ", "ĳ": "ij",
}
_LINE_BREAKS = {" ": "\n", " ": "\n", "\x85": "\n"}
_WIDTH = {chr(cp): chr(cp - 0xFF01 + 0x21) for cp in range(0xFF01, 0xFF5F)}
_WIDTH["　"] = " "

_TRANSLATE = str.maketrans({**_QUOTES, **_LIGATURES, **_LINE_BREAKS, **_WIDTH})

# --- mojibake repair -------------------------------------------------------

# char -> byte map for "sloppy windows-1252": the five bytes cp1252 leaves
# undefined (0x81 0x8D 0x8F 0x90 0x9D) decode to their C1 codepoints, which is
# how mojibake text actually carries them.
_SLOPPY_1252 = {}
for _b in range(256):
    try:
        _SLOPPY_1252[bytes([_b]).decode("cp1252")] = _b
    except UnicodeDecodeError:
        _SLOPPY_1252[chr(_b)] = _b

_NONASCII = re.compile(r"[^\x00-\x7f]")


def _encode_sloppy1252(text: str) -> bytes:
    return bytes(_SLOPPY_1252[c] for c in text)  # KeyError = not encodable


def _mojibake_pass(text: str) -> str:
    """One repair attempt: re-encode as (sloppy) 1252 / latin-1 and decode as
    UTF-8; accept only if the result is strictly less non-ASCII."""
    bad = _NONASCII.findall(text)
    if not bad:
        return text
    for encode in (_encode_sloppy1252, lambda t: t.encode("latin-1")):
        try:
            candidate = encode(text).decode("utf-8")
        except (KeyError, UnicodeEncodeError, UnicodeDecodeError):
            continue
        if len(_NONASCII.findall(candidate)) < len(bad):
            return candidate
    return text


# ASCII whitespace only: mojibake can legitimately contain NBSP (e.g. "à" →
# "Ã\xa0"), so unicode-aware splitting would cut repairable sequences apart.
_ASCII_WS = re.compile(r"([ \t\n\r\f\v]+)")


def _fix_segment(seg: str) -> str:
    for _ in range(3):  # double/triple-encoded mojibake heals iteratively
        fixed = _mojibake_pass(seg)
        if fixed == seg:
            break
        seg = fixed
    return seg


def fix_text(text: str) -> str:
    """Deterministic subset of ``ftfy.fix_text`` (see module docstring).

    Mojibake repair runs per whitespace-separated segment so mixed-script
    text heals: in "病理 donâ€™t" the CJK segment (not 1252-encodable) passes
    through while the mojibake segment still repairs. Limitation vs real
    ftfy: CJK and mojibake joined *inside one segment* stay unrepaired."""
    text = "".join(_fix_segment(seg) for seg in _ASCII_WS.split(text))
    text = text.translate(_TRANSLATE)
    return unicodedata.normalize("NFC", text)
