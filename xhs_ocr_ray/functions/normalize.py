"""Per-line text normalization + structured pairing (SURVEY.md §2.2 M6-M10).

``normalize_lines`` reproduces the reference normalizer's *shape* (ordered:
CJK strip unless the doc class opts out, then literal replaces, then drop
empties — core/run.py:462-476) with the replace table made explicit config.
``pair_lines`` is the traffic-analysis pairing transform (core/run.py:478-485):
exactly 2k lines → ``"k1:v1|k2:v2|..."``, else nothing. ``parse_cn_number``
converts ``"1.5万" → 15000`` (core/run.py:679-690). All pure and
deterministic — they define golden bytes.
"""

from __future__ import annotations

import re

_CJK_STRIP = re.compile(r"[一-鿿]+")
_DIGITS = re.compile(r"\d+")

# Ordered literal replacements applied after the CJK strip (analog of the
# reference's 秒/space/o→0/<b> chain).
DEFAULT_REPLACES: tuple[tuple[str, str], ...] = (
    ("秒", ""),
    (" ", ""),
    ("o", "0"),
    ("O", "0"),
    ("<b>", ""),
    ("</b>", ""),
)


def normalize_line(line: str, *, strip_cjk: bool = True,
                   replaces: tuple[tuple[str, str], ...] = DEFAULT_REPLACES) -> str:
    if strip_cjk:
        line = _CJK_STRIP.sub("", line)
    for old, new in replaces:
        line = line.replace(old, new)
    return line


def normalize_lines(lines: list[str], *, strip_cjk: bool = True,
                    replaces: tuple[tuple[str, str], ...] = DEFAULT_REPLACES) -> list[str]:
    """Normalize each line in order, dropping lines that become empty."""
    out = []
    for ln in lines:
        norm = normalize_line(ln, strip_cjk=strip_cjk, replaces=replaces)
        if norm:
            out.append(norm)
    return out


def pair_lines(lines: list[str], expected: int = 8) -> list[str]:
    """Zip adjacent (label, value) lines into one ``"k:v|k:v"`` string.

    Returns ``[paired]`` when ``len(lines) == expected`` (even), else ``[]``
    (the reference emits nothing on mismatch, core/run.py:478-485).
    """
    if len(lines) != expected or expected % 2 != 0:
        return []
    pairs = [f"{lines[i]}:{lines[i + 1]}" for i in range(0, len(lines), 2)]
    return ["|".join(pairs)]


def canonical_doc_class(tag: str) -> str:
    """Strip digits from a doc-class tag (core/run.py:504)."""
    return _DIGITS.sub("", tag)


def content_type_of(tag: str) -> str:
    """Derive coarse content type from the doc-class tag (core/run.py:507-509)."""
    return "video" if "video" in tag else "article"


_CN_UNITS = {"万": 10_000, "亿": 100_000_000, "千": 1_000, "百": 100, "k": 1_000,
             "K": 1_000, "w": 10_000, "W": 10_000}


def parse_cn_number(s: str) -> float:
    """``"1.5万" → 15000.0``; plain numerics pass through; '' → 0.0."""
    s = s.strip()
    if not s:
        return 0.0
    unit = 1
    if s[-1] in _CN_UNITS:
        unit = _CN_UNITS[s[-1]]
        s = s[:-1]
    try:
        return float(s) * unit
    except ValueError:
        return 0.0
