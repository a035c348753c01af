"""Property-based tests (hypothesis) for the deterministic kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from xhs_ocr_ray.functions.hashing import (
    hamming64,
    md5_hex,
    rolling_fingerprint,
    simhash64,
    stable_hash64,
)
from xhs_ocr_ray.html.extract import extract_main_text
from xhs_ocr_ray.layout.separators import join_fragments, word_separator

text_st = st.text(max_size=200)


@given(text_st, text_st)
def test_word_separator_total(a, b):
    sep = word_separator(a, b)
    assert sep in ("", " ")


@given(st.lists(text_st, max_size=8))
def test_join_fragments_never_raises_and_contains_parts(frags):
    out = join_fragments(frags)
    for f in frags:
        if f:
            assert f in out


@given(st.binary(max_size=2048))
@settings(max_examples=60, deadline=2000)
def test_extract_never_raises_on_garbage(payload):
    res = extract_main_text(payload)
    assert res is None or isinstance(res, str)


@given(text_st)
def test_hashes_deterministic(s):
    assert stable_hash64(s) == stable_hash64(s)
    assert md5_hex(s) == md5_hex(s)
    assert rolling_fingerprint(s) == rolling_fingerprint(s)


@given(st.lists(st.text(min_size=1, max_size=12), max_size=30))
def test_simhash_self_distance_zero(tokens):
    h = simhash64(tokens)
    assert hamming64(h, h) == 0
    assert 0 <= h < 1 << 64
