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


# url-ish strings: realistic corpus shapes, plus adversarial characters that
# urlsplit normalizes (tabs/newlines stripped mid-url, C0+space trimmed at
# the ends) or REJECTS (unbalanced '['/']' in the authority raises
# ValueError → doc_class "default"; ADVICE r04) — the vectorized fast path
# must either agree or fall back.
_seg_chars = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij0123456789-_.%~:@ \t\n\r/?#\x00\x7f[]中文")
    ),
    max_size=12,
)
_url_st = st.one_of(
    st.builds(
        lambda scheme, host, path: f"{scheme}://{host}/{path}",
        st.sampled_from(["http", "https", "HTTP", "ftp"]),
        _seg_chars,
        _seg_chars,
    ),
    _seg_chars,  # not a url at all
    st.text(max_size=40),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_url_st, min_size=0, max_size=20))
def test_batch_doc_classes_matches_per_row(urls):
    import pyarrow as pa

    from xhs_ocr_ray.engine import batch_doc_classes, doc_class_of

    got = batch_doc_classes(pa.array(urls, pa.string()), {})
    assert got == [doc_class_of(u) for u in urls]


@settings(max_examples=300, deadline=None)
@given(st.lists(_url_st, min_size=0, max_size=20))
def test_canonical_url_idempotent(urls):
    from xhs_ocr_ray.functions.urls import canonical_url

    for u in urls:
        c = canonical_url(u)
        assert canonical_url(c) == c, (u, c)


_doc_st = st.text(
    alphabet=st.sampled_from(list("ab xyz0189      ")), max_size=80)


@settings(max_examples=200, deadline=None)
@given(st.lists(_doc_st, min_size=0, max_size=12),
       st.integers(min_value=1, max_value=9))
def test_chunk_tokens_partition_roundtrip(texts, window):
    """Non-overlapping windows partition the tokens exactly: chunk sizes
    sum to the token count and re-joining chunks reproduces the
    space-normalized document."""
    import pyarrow as pa

    from xhs_ocr_ray.stages.text_analysis import chunk_tokens_batch

    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = chunk_tokens_batch(b, window=window).to_pandas()
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        mine = out[out.doc_id == i].sort_values("chunk_idx")
        assert int(mine.n_tokens.sum()) == len(toks)
        assert " ".join(mine.chunk_text) == " ".join(toks)
        assert all(n == window for n in mine.n_tokens[:-1].tolist())


@settings(max_examples=200, deadline=None)
@given(st.lists(_doc_st, min_size=0, max_size=10))
def test_pii_scrub_never_leaves_matches(texts):
    import pyarrow as pa

    from xhs_ocr_ray.stages.text_analysis import (
        PII_PATTERNS,
        pii_scrub_batch,
    )

    b = pa.table({"text": pa.array(texts, pa.string())})
    out = pii_scrub_batch(b, col="text")
    import re
    for s in out.column("text_scrubbed").to_pylist():
        for _, pat, _tok in PII_PATTERNS:
            assert not re.search(pat, s), (s, pat)
