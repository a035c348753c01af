"""Related/unrelated merge semantics (J1/J2 parity)."""

import pytest

from xhs_ocr_ray.stages.merge import (
    MissingTableError,
    related_key_count,
    related_merge,
    unrelated_merge,
)


def _tables(ray_session=None):
    import ray.data

    top = ray.data.from_items(
        [
            {"k": "a", "views": "10", "likes": ""},
            {"k": "b", "views": "20", "likes": "2"},
        ]
    )
    bottom = ray.data.from_items(
        [
            {"k": "a", "likes": "111", "shares": "5"},
            {"k": "c", "likes": "3", "shares": "9"},
        ]
    )
    return top, bottom


def test_related_merge_full_outer_last_nonempty(ray_session):
    top, bottom = _tables()
    out = related_merge([top, bottom], ["k"]).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == ["a", "b", "c"]
    # 'a': likes empty in top, non-empty in bottom → bottom wins.
    assert out.loc[0, "likes"] == "111"
    assert out.loc[0, "views"] == "10"
    assert out.loc[0, "shares"] == "5"
    # 'b': only in top; missing cols padded with "".
    assert out.loc[1, "views"] == "20"
    assert out.loc[1, "shares"] == ""
    # 'c': only in bottom.
    assert out.loc[2, "views"] == ""
    assert out.loc[2, "likes"] == "3"


def test_related_merge_last_nonempty_order_dependence(ray_session):
    import ray.data

    t1 = ray.data.from_items([{"k": "x", "v": "first"}])
    t2 = ray.data.from_items([{"k": "x", "v": "second"}])
    out = related_merge([t1, t2], ["k"]).to_pandas()
    assert out.loc[0, "v"] == "second"  # later table wins when non-empty
    out2 = related_merge([t2, t1], ["k"]).to_pandas()
    assert out2.loc[0, "v"] == "first"


def test_related_merge_absent_table_aborts(ray_session):
    top, _ = _tables()
    with pytest.raises(MissingTableError):
        related_merge([top, None], ["k"])


def test_related_merge_skips_table_without_key(ray_session):
    import ray.data

    top, _ = _tables()
    no_key = ray.data.from_items([{"other": "1", "views": "99"}])
    out = related_merge([top, no_key], ["k"]).to_pandas().sort_values("k")
    assert out["views"].tolist() == ["10", "20"]  # no_key contributed nothing


def test_unrelated_merge_union_pads_empty(ray_session):
    top, bottom = _tables()
    out = unrelated_merge([top, bottom]).to_pandas()
    assert len(out) == 4
    assert set(out.columns) == {"k", "views", "likes", "shares"}
    only_bottom = out[out["k"] == "c"].iloc[0]
    assert only_bottom["views"] == ""


def test_unrelated_merge_tolerates_absent(ray_session):
    top, _ = _tables()
    out = unrelated_merge([top, None]).to_pandas()
    assert len(out) == 2
    with pytest.raises(MissingTableError):
        unrelated_merge([None, None])


def test_related_key_count(ray_session):
    top, bottom = _tables()
    assert related_key_count([top, bottom], ["k"]) == 1  # only 'a' in both
