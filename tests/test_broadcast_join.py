from xhs_ocr_ray.stages.merge import broadcast_join


def _sides():
    import ray.data

    big = ray.data.from_items(
        [
            {"k": 1, "v": "a"},
            {"k": 2, "v": "b"},
            {"k": 3, "v": "c"},
        ]
    )
    small = ray.data.from_items(
        [
            {"kk": 1, "name": "one"},
            {"kk": 3, "name": "three"},
            {"kk": 9, "name": "nine"},
        ]
    )
    return big, small


def test_inner_broadcast_join(ray_session):
    big, small = _sides()
    out = (
        broadcast_join(big, small, on="k", right_on="kk",
                       select={"name": "small_name"})
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [1, 3]
    assert out["small_name"].tolist() == ["one", "three"]


def test_semi_and_anti_broadcast_join(ray_session):
    big, small = _sides()
    semi = broadcast_join(big, small, on="k", right_on="kk", select={},
                          how="semi").to_pandas()
    anti = broadcast_join(big, small, on="k", right_on="kk", select={},
                          how="anti").to_pandas()
    assert sorted(semi["k"].tolist()) == [1, 3]
    assert anti["k"].tolist() == [2]
    assert list(anti.columns) == ["k", "v"]  # big rows unchanged


def test_broadcast_join_small_side_guard(ray_session):
    import pytest

    big, small = _sides()
    with pytest.raises(ValueError, match="shuffle join"):
        broadcast_join(big, small, on="k", right_on="kk", select={},
                       max_rows=1)
