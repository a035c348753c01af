"""CCNet-style corpus boilerplate line removal."""

import pyarrow as pa

from xhs_ocr_ray.stages.boilerplate import boilerplate_line_filter


def _corpus_ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "host": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(3)


def test_boilerplate_lines_dropped_per_group(ray_session):
    rows = [
        (1, "a.com", "COOKIE BANNER\nunique one\nFOOTER"),
        (2, "a.com", "COOKIE BANNER\nunique two\nFOOTER"),
        (3, "a.com", "COOKIE BANNER\nunique three\nFOOTER"),
        # same line on ANOTHER host: only 1 doc there → kept
        (4, "b.com", "COOKIE BANNER\nother host body"),
        # doc that is PURE boilerplate → empty clean_text, kept for lineage
        (5, "a.com", "COOKIE BANNER\nFOOTER"),
        # duplicate line WITHIN one doc counts that doc once
        (6, "b.com", "dup line\ndup line\nbody six"),
        (7, "b.com", "dup line\nbody seven"),
    ]
    out = boilerplate_line_filter(
        _corpus_ds(rows), text_col="text", id_col="doc_id",
        group_col="host", min_docs=3,
    ).to_pandas().set_index("doc_id").sort_index()

    assert out.loc[1, "clean_text"] == "unique one"
    assert out.loc[1, "n_kept"] == 1 and out.loc[1, "n_removed"] == 2
    assert out.loc[4, "clean_text"] == "COOKIE BANNER\nother host body"
    assert out.loc[4, "n_removed"] == 0
    assert out.loc[5, "clean_text"] == "" and out.loc[5, "n_kept"] == 0
    # 'dup line' appears in 2 distinct docs (not 3): kept, order preserved
    assert out.loc[6, "clean_text"] == "dup line\ndup line\nbody six"
    assert len(out) == 7


def test_boilerplate_min_docs_one_bans_everything(ray_session):
    rows = [(1, "h", "a\nb"), (2, "h", "c")]
    out = boilerplate_line_filter(
        _corpus_ds(rows), text_col="text", id_col="doc_id",
        group_col="host", min_docs=1,
    ).to_pandas()
    assert (out["clean_text"] == "").all()
    assert out["n_kept"].sum() == 0 and out["n_removed"].sum() == 3


def test_boilerplate_hot_line_spreads_across_buckets(ray_session):
    """VERDICT r05: banned-line detection salts by doc id — the occurrence
    rows of one hot (group, line) must spread over many buckets, never
    concentrate in one bucket task."""
    import collections

    import pyarrow as pa

    from xhs_ocr_ray.stages.bucketing import _add_key_bucket

    n_docs = 2000
    tbl = pa.table({
        "host": pa.array(["a.com"] * n_docs),
        "__line": pa.array(["COOKIE BANNER"] * n_docs),
        "doc_id": pa.array(list(range(n_docs)), pa.int64()),
    })
    bucketed = _add_key_bucket(tbl, key_cols=["host", "__line", "doc_id"],
                               num_buckets=64)
    counts = collections.Counter(bucketed.column("__kb").to_pylist())
    assert len(counts) > 16               # spread over many buckets
    assert max(counts.values()) < n_docs / 4   # no bucket holds them all


def test_boilerplate_banned_guard(ray_session):
    import pytest

    rows = [(i, "h", f"line{i}\ncommon") for i in range(5)]
    with pytest.raises(ValueError, match="banned lines"):
        boilerplate_line_filter(
            _corpus_ds(rows), text_col="text", id_col="doc_id",
            group_col="host", min_docs=1, max_banned_lines=2,
        ).to_pandas()
