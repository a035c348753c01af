"""BPE tokenizer: determinism goldens + chunker stage behavior."""

import pyarrow as pa
import pytest


def test_bpe_golden_ids():
    """Token ids are a pure function of the fixture merges — pinned."""
    from xhs_ocr_ray.functions.bpe import BpeTokenizer

    tok = BpeTokenizer.fixture()
    assert len(tok.merges) == 200
    assert len(tok.id_of) == 240
    assert tok.encode("the quick brown fox") == [170, 132, 29, 143, 43, 115]
    assert tok.encode("tokens and documents") == [184, 27, 36, 30, 203]
    # unknown characters hit the unk id (0); known neighbors still encode
    ids = tok.encode("zzzqqq 中文")
    assert ids == [228, 228, 228, 126, 126, 126, 23, 0, 0, 23]


def test_bpe_roundtrip_and_determinism():
    from xhs_ocr_ray.functions.bpe import BpeTokenizer, train_bpe
    from xhs_ocr_ray.functions.bpe import FIXTURE_CORPUS

    m1 = train_bpe(FIXTURE_CORPUS, 200)
    m2 = train_bpe(FIXTURE_CORPUS, 200)
    assert m1 == m2  # training is deterministic
    tok = BpeTokenizer(m1)
    for s in ["the quick brown fox", "pack my box", "jump quickly",
              "data processing engines", "0 1 2 19 20"]:
        assert tok.decode(tok.encode(s)) == s
    assert tok.encode("") == []
    assert tok.encode("   ") == []


def test_bpe_merges_respect_word_boundaries():
    from xhs_ocr_ray.functions.bpe import BpeTokenizer

    tok = BpeTokenizer.fixture()
    # encoding word-by-word equals encoding the joined text
    a = tok.encode("the") + tok.encode("quick")
    assert a == tok.encode("the quick")


def test_bpe_chunker_stage(ray_session):
    import ray.data

    from xhs_ocr_ray.functions.bpe import BpeTokenizer
    from xhs_ocr_ray.functions.hashing import md5_hex
    from xhs_ocr_ray.stages.text_analysis import BpeChunker

    docs = [
        {"doc_id": 1, "text": "the quick brown fox " * 10},  # 60 ids
        {"doc_id": 2, "text": ""},                           # no chunks
        {"doc_id": 3, "text": "tokens and documents"},
    ]
    ds = ray.data.from_items(docs, override_num_blocks=2)
    out = (ds.map_batches(BpeChunker, batch_format="pyarrow",
                          fn_constructor_kwargs={"window": 16},
                          concurrency=(1, 2))
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    d1 = out[out.doc_id == 1]
    assert d1.n_tokens.tolist() == [16, 16, 16, 12]  # 60 ids / window 16
    assert (d1.n_unk == 0).all()
    assert 2 not in set(out.doc_id)
    d3 = out[out.doc_id == 3]
    tok = BpeTokenizer.fixture()
    want = tok.encode("tokens and documents")
    assert d3.n_tokens.tolist() == [len(want)]
    assert d3.ids_fp.tolist() == [md5_hex(" ".join(map(str, want)))]


def test_bpe_chunker_rejects_bad_window():
    from xhs_ocr_ray.stages.text_analysis import BpeChunker

    with pytest.raises(ValueError, match="window"):
        BpeChunker(window=0)
