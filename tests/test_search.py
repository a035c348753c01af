import os

from xhs_ocr_ray.stages.search import InvertedIndex, _token_bucket


def _corpus(ray):
    import ray.data

    return ray.data.from_items([
        {"doc_id": 1, "text": "fast table scan with hash join"},
        {"doc_id": 2, "text": "hash hash hash only"},          # dup tokens
        {"doc_id": 3, "text": "table of contents"},
        {"doc_id": 4, "text": "nothing relevant"},
        {"doc_id": 5, "text": ""},
    ], override_num_blocks=2)


def test_inverted_index_and_or(ray_session, tmp_path):
    import ray

    idx = InvertedIndex(_corpus(ray), index_dir=str(tmp_path / "inv"))
    got = idx.search(["table", "hash"]).to_pandas()
    assert got.doc_id.tolist() == [1]
    assert got.n_matched.tolist() == [2]

    any_hit = (idx.search(["table", "hash"], mode="or")
               .to_pandas().set_index("doc_id").sort_index())
    assert any_hit.index.tolist() == [1, 2, 3]
    # doc 2's repeated token counts once
    assert any_hit.n_matched.tolist() == [2, 1, 1]

    # duplicate query terms collapse; unknown term under AND → empty
    assert idx.search(["table", "table"]).to_pandas().doc_id.tolist() == [1, 3]
    assert idx.search(["table", "zzz"]).to_pandas().empty
    assert idx.search([]).count() == 0


def test_inverted_index_reuse_and_pruning(ray_session, tmp_path):
    import ray

    d = str(tmp_path / "inv2")
    idx = InvertedIndex(_corpus(ray), index_dir=d)
    assert os.path.exists(os.path.join(d, "_INDEX_BUILT"))
    # reuse skips the rebuild (same marker mtime)
    m0 = os.path.getmtime(os.path.join(d, "_INDEX_BUILT"))
    idx2 = InvertedIndex(_corpus(ray), index_dir=d, reuse_existing=True)
    assert os.path.getmtime(os.path.join(d, "_INDEX_BUILT")) == m0
    assert idx2.search(["table"]).to_pandas().doc_id.tolist() == [1, 3]
    # probe reads only the term's bucket dir
    b = _token_bucket("table", idx.num_buckets)
    assert os.path.isdir(os.path.join(d, f"tb={b}"))
