"""Separator inference between adjacent text fragments.

Decides what goes *between* two fragments when they are concatenated into a
line or paragraph. The rules (reference behavior described in SURVEY.md §2.4
L4, tbpu/parser_tools/paragraph_parse.py:9-36):

1. ``""`` when the adjoining characters are both CJK-family (incl. kana,
   hangul, fullwidth forms, CJK punctuation),
2. ``""`` when the previous fragment ends with an ASCII hyphen ``-``
   (hyphenated line wrap),
3. ``""`` when the next fragment starts with punctuation (Unicode category
   ``P*``),
4. ``" "`` otherwise.

These rules determine golden bytes — do not change without regenerating
goldens.
"""

from __future__ import annotations

import unicodedata

# Frozen CJK-family ranges (inclusive). Covers CJK Unified + Ext A,
# CJK punctuation, Hiragana, Katakana (+ phonetic extensions), Hangul
# syllables + jamo, and fullwidth/halfwidth forms.
_CJK_RANGES: tuple[tuple[int, int], ...] = (
    (0x1100, 0x11FF),  # Hangul Jamo
    (0x2E80, 0x2EFF),  # CJK Radicals Supplement
    (0x3000, 0x303F),  # CJK Symbols and Punctuation
    (0x3040, 0x309F),  # Hiragana
    (0x30A0, 0x30FF),  # Katakana
    (0x31F0, 0x31FF),  # Katakana Phonetic Extensions
    (0x3400, 0x4DBF),  # CJK Ext A
    (0x4E00, 0x9FFF),  # CJK Unified Ideographs
    (0xAC00, 0xD7AF),  # Hangul Syllables
    (0xF900, 0xFAFF),  # CJK Compatibility Ideographs
    (0xFE30, 0xFE4F),  # CJK Compatibility Forms
    (0xFF00, 0xFFEF),  # Halfwidth and Fullwidth Forms
)


def is_cjk_char(ch: str) -> bool:
    """True if ``ch`` belongs to the frozen CJK-family ranges above."""
    cp = ord(ch)
    if cp < 0x1100:  # ASCII/Latin fast path — the overwhelming hot case
        return False
    for lo, hi in _CJK_RANGES:
        if lo <= cp <= hi:
            return True
    return False


def _is_punct(ch: str) -> bool:
    return unicodedata.category(ch).startswith("P")


def word_separator(prev_text: str, next_text: str) -> str:
    """Separator to place between ``prev_text`` and ``next_text``."""
    if not prev_text or not next_text:
        return ""
    a, b = prev_text[-1], next_text[0]
    if is_cjk_char(a) and is_cjk_char(b):
        return ""
    if a == "-":
        return ""
    if _is_punct(b):
        return ""
    return " "


def join_fragments(fragments: list[str]) -> str:
    """Concatenate fragments inserting :func:`word_separator` between each."""
    out: list[str] = []
    prev = ""
    for frag in fragments:
        if not frag:
            continue
        if prev:
            out.append(word_separator(prev, frag))
        out.append(frag)
        prev = frag
    return "".join(out)
