import numpy as np
import pyarrow as pa
import pytest

from xhs_ocr_ray.stages.decontam import (
    collect_eval_ngram_hashes,
    doc_ngram_hashes,
    ngram_decontaminate,
)


def test_doc_ngram_hashes_basic():
    # "a b c d" → 3-grams "a b c", "b c d"
    h = doc_ngram_hashes("a b c d", 3)
    assert len(h) == 2
    # duplicates collapse; empties in the split are dropped
    h2 = doc_ngram_hashes("a  b c d  a b c", 3)
    assert set(h) <= set(h2.tolist())
    assert len(doc_ngram_hashes("a b", 3)) == 0
    assert len(doc_ngram_hashes("", 3)) == 0
    assert len(doc_ngram_hashes(None, 3)) == 0


def test_doc_ngram_hashes_matches_duckdb_md5():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    want = con.execute(
        "SELECT ('0x' || substr(md5('a b c'), 1, 16))::UBIGINT").fetchone()[0]
    assert doc_ngram_hashes("a b c", 3)[0] == np.uint64(want)


def test_ngram_decontaminate_ray(ray_session):
    import ray.data

    eval_ds = ray.data.from_items(
        [{"doc_id": 100, "text": "the quick brown fox jumps"}],
        override_num_blocks=1)
    train = ray.data.from_items([
        {"doc_id": 1, "text": "a quick brown fox ran away"},  # 1 shared 3-gram
        {"doc_id": 2, "text": "totally clean document here now"},
        {"doc_id": 3, "text": "x y"},                          # too short
        {"doc_id": 4, "text": "the quick brown fox jumps high"},  # 3 shared
    ], override_num_blocks=2)

    ev = collect_eval_ngram_hashes(eval_ds, n=3)
    assert len(ev) == 3 and (np.diff(ev.astype(np.int64)) > 0).all()

    out = (ngram_decontaminate(train, ev, n=3)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.n_ngrams.tolist() == [4, 3, 0, 4]
    assert out.n_contam.tolist() == [1, 0, 0, 3]
    assert out.contaminated.tolist() == [True, False, False, True]

    dropped = ngram_decontaminate(train, ev, n=3, drop=True).to_pandas()
    assert sorted(dropped.doc_id.tolist()) == [2, 3]

    # empty eval set → nothing contaminated
    out0 = ngram_decontaminate(
        train, np.empty(0, np.uint64), n=3).to_pandas()
    assert out0.n_contam.tolist() == [0, 0, 0, 0]


def test_collect_eval_guard(ray_session):
    import ray.data

    eval_ds = ray.data.from_items(
        [{"text": "a b c d e f g h"}], override_num_blocks=1)
    with pytest.raises(ValueError, match="max_eval_ngrams"):
        collect_eval_ngram_hashes(eval_ds, n=3, max_eval_ngrams=2)


def test_substring_decontaminate(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.decontam import substring_decontaminate

    docs = [
        {"doc_id": 1, "text": "the secret eval answer is forty two ok"},
        {"doc_id": 2, "text": "clean text with nothing shared"},
        {"doc_id": 3, "text": "prefix secret eval answer suffix and "
                              "another probe right here too"},
        {"doc_id": 4, "text": None},
    ]
    ds = ray.data.from_items(docs, override_num_blocks=2)
    out = substring_decontaminate(
        ds, ["secret eval answer", "another probe", "", "absent probe"],
    ).to_pandas().set_index("doc_id").sort_index()
    assert out.n_probe_hits.tolist() == [1, 0, 2, 0]
    assert out.substring_contaminated.tolist() == [True, False, True, False]

    dropped = substring_decontaminate(
        ds, ["secret eval answer"], drop=True).to_pandas()
    assert sorted(dropped.doc_id) == [2, 4]

    import pytest

    with pytest.raises(ValueError, match="max_probes"):
        substring_decontaminate(ds, ["a", "b", "c"], max_probes=2)
