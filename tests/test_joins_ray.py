"""as-of join and range join (stages/joins.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ts(s):
    return pd.Timestamp(s)


def _mk(rows, schema):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


LEFT_SCHEMA = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                         ("ts", pa.timestamp("us"))])
RIGHT_SCHEMA = pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us")),
                          ("price", pa.float64())])


def test_asof_backward_with_value(ray_session):
    from xhs_ocr_ray.stages.joins import asof_join

    left = _mk([
        {"event_id": 1, "user_id": 7, "ts": _ts("2024-01-01 10:00")},
        {"event_id": 2, "user_id": 7, "ts": _ts("2024-01-01 12:00")},
        {"event_id": 3, "user_id": 7, "ts": _ts("2024-01-01 09:00")},  # no match
        {"event_id": 4, "user_id": 8, "ts": _ts("2024-01-01 12:00")},  # other key
    ], LEFT_SCHEMA)
    right = _mk([
        {"user_id": 7, "ts": _ts("2024-01-01 09:30"), "price": 1.0},
        {"user_id": 7, "ts": _ts("2024-01-01 11:00"), "price": 2.0},
        {"user_id": 9, "ts": _ts("2024-01-01 00:00"), "price": 9.0},
    ], RIGHT_SCHEMA)
    out = asof_join(left, right, by_col="user_id", ts_col="ts",
                    right_val_col="price").to_pandas()
    got = out.set_index("event_id").sort_index()
    assert got.loc[1, "asof_val"] == 1.0
    assert got.loc[2, "asof_val"] == 2.0
    assert pd.isna(got.loc[3, "asof_ts"])   # before any right row
    assert pd.isna(got.loc[4, "asof_ts"])   # user 8 has no right rows
    assert got.loc[2, "asof_ts"] == _ts("2024-01-01 11:00")


def test_asof_forward_and_exact_match(ray_session):
    from xhs_ocr_ray.stages.joins import asof_join

    left = _mk([
        {"event_id": 1, "user_id": 1, "ts": _ts("2024-01-01 10:00")},
        {"event_id": 2, "user_id": 1, "ts": _ts("2024-01-01 23:00")},
    ], LEFT_SCHEMA)
    right = _mk([
        {"user_id": 1, "ts": _ts("2024-01-01 10:00"), "price": 5.0},  # exact
        {"user_id": 1, "ts": _ts("2024-01-01 22:00"), "price": 6.0},
    ], RIGHT_SCHEMA)
    out = asof_join(left, right, by_col="user_id", ts_col="ts",
                    right_val_col="price", direction="forward").to_pandas()
    got = out.set_index("event_id")
    assert got.loc[1, "asof_val"] == 5.0       # exact match allowed
    assert pd.isna(got.loc[2, "asof_ts"])      # nothing at/after 23:00


def test_asof_matches_pandas_reference(ray_session):
    """Random many-key corpus vs a driver-side global merge_asof."""
    from xhs_ocr_ray.stages.joins import asof_join

    rng = np.random.default_rng(7)
    n_l, n_r = 500, 200
    lt = pd.DataFrame({
        "event_id": np.arange(n_l, dtype=np.int64),
        "user_id": rng.integers(0, 20, n_l),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
    })
    rt = pd.DataFrame({
        "user_id": rng.integers(0, 20, n_r),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
        "price": rng.normal(size=n_r).round(3),
    })
    want = pd.merge_asof(
        lt.sort_values("ts", kind="mergesort"),
        rt.sort_values(["ts", "price"], kind="mergesort").rename(
            columns={"ts": "asof_ts", "price": "asof_val"}),
        left_on="ts", right_on="asof_ts", by="user_id", direction="backward",
    ).sort_values("event_id")

    left = _mk(lt.to_dict("records"), LEFT_SCHEMA)
    right = _mk(rt.to_dict("records"), RIGHT_SCHEMA)
    out = (
        asof_join(left, right, by_col="user_id", ts_col="ts",
                  right_val_col="price")
        .to_pandas().sort_values("event_id")
    )
    out["asof_ts"] = out["asof_ts"].astype("datetime64[ns]")  # unit only
    pd.testing.assert_frame_equal(
        out[["event_id", "asof_ts", "asof_val"]].reset_index(drop=True),
        want[["event_id", "asof_ts", "asof_val"]].reset_index(drop=True),
    )


def test_asof_rejects_non_arrow_schema():
    """The Arrow-schema guard message names the fix (no Ray needed)."""
    from xhs_ocr_ray.stages.joins import asof_join

    class FakeSchema:
        names = ["user_id", "ts"]
        types = [int, pd.Timestamp]  # python types = pandas-block dataset

    class FakeDs:
        def schema(self):
            return FakeSchema()

    with pytest.raises(TypeError, match="Arrow schema"):
        asof_join(FakeDs(), FakeDs(), by_col="user_id", ts_col="ts")


def test_shuffle_join_inner_fanout(ray_session):
    from xhs_ocr_ray.stages.joins import shuffle_join

    left = _mk([
        {"event_id": 1, "user_id": 7, "ts": _ts("2024-01-01")},
        {"event_id": 2, "user_id": 7, "ts": _ts("2024-01-02")},
        {"event_id": 3, "user_id": 8, "ts": _ts("2024-01-03")},
        {"event_id": 4, "user_id": 9, "ts": _ts("2024-01-04")},  # no right
    ], LEFT_SCHEMA)
    right = _mk([
        {"user_id": 7, "ts": _ts("2024-02-01"), "price": 1.5},
        {"user_id": 7, "ts": _ts("2024-02-02"), "price": 2.5},  # fan-out ×2
        {"user_id": 8, "ts": _ts("2024-02-03"), "price": 3.5},
    ], RIGHT_SCHEMA).map_batches(
        lambda b: b.rename_columns(["user_id", "rts", "price"]),
        batch_format="pyarrow",
    )
    out = shuffle_join(left, right, on="user_id").to_pandas()
    got = sorted(zip(out["event_id"], out["price"]))
    assert got == [(1, 1.5), (1, 2.5), (2, 1.5), (2, 2.5), (3, 3.5)]


def test_shuffle_join_left_null_types(ray_session):
    """Left join pads unmatched rows with TYPED nulls (int64 stays int64)."""
    import ray.data
    from xhs_ocr_ray.stages.joins import shuffle_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lval": pa.array(["a", "b", "c"], pa.string()),
    }))
    big = 2**61 + 1  # would corrupt through a float64 round-trip
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rid": pa.array([big], pa.int64()),
    }))
    out = shuffle_join(left, right, on="k", how="left")
    t = pa.concat_tables(ray.get(r) for r in out.to_arrow_refs())
    assert t.schema.field("rid").type == pa.int64()
    by_k = {k: v for k, v in zip(t.column("k").to_pylist(),
                                 t.column("rid").to_pylist())}
    assert by_k == {1: big, 2: None, 3: None}


def test_shuffle_join_matches_pandas_reference(ray_session):
    """Random many-key corpus vs a driver-side pandas merge."""
    import ray.data
    from xhs_ocr_ray.stages.joins import shuffle_join

    rng = np.random.default_rng(11)
    lt = pd.DataFrame({
        "k": rng.integers(0, 40, 600).astype(np.int64),
        "lid": np.arange(600, dtype=np.int64),
    })
    rt = pd.DataFrame({
        "k": rng.integers(0, 50, 300).astype(np.int64),
        "rv": rng.normal(size=300).round(3),
    })
    want = lt.merge(rt, on="k", how="inner")
    out = shuffle_join(
        ray.data.from_arrow(pa.Table.from_pandas(lt, preserve_index=False)),
        ray.data.from_arrow(pa.Table.from_pandas(rt, preserve_index=False)),
        on="k",
    ).to_pandas()
    key = ["k", "lid", "rv"]
    pd.testing.assert_frame_equal(
        out[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )


def test_shuffle_join_rejects_name_clash():
    from xhs_ocr_ray.stages.joins import shuffle_join

    class FakeSchema:
        names = ["k", "v"]
        types = [pa.int64(), pa.int64()]

    class FakeDs:
        def schema(self):
            return FakeSchema()

    with pytest.raises(ValueError, match="collide"):
        shuffle_join(FakeDs(), FakeDs(), on="k")


def test_range_join_overlap_fanout(ray_session):
    from xhs_ocr_ray.stages.joins import range_join_broadcast

    left = _mk([
        {"event_id": 1, "user_id": 0, "ts": _ts("2024-01-01 01:00")},
        {"event_id": 2, "user_id": 0, "ts": _ts("2024-01-01 02:30")},  # in both
        {"event_id": 3, "user_id": 0, "ts": _ts("2024-01-01 09:00")},  # in none
    ], LEFT_SCHEMA)
    ranges = pa.table({
        "range_id": pa.array([10, 11], pa.int64()),
        "start_ts": pa.array([_ts("2024-01-01 00:00"), _ts("2024-01-01 02:00")],
                             pa.timestamp("us")),
        "end_ts": pa.array([_ts("2024-01-01 03:00"), _ts("2024-01-01 05:00")],
                           pa.timestamp("us")),
    })
    out = range_join_broadcast(
        left, ranges, ts_col="ts", start_col="start_ts", end_col="end_ts",
        range_cols=["range_id"],
    ).to_pandas()
    pairs = sorted(zip(out["event_id"], out["range_id"]))
    assert pairs == [(1, 10), (2, 10), (2, 11)]


def test_shuffle_join_right_and_full_outer(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from xhs_ocr_ray.stages.joins import shuffle_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64()),
    })).repartition(2)
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array([200, 300, 400], pa.int64()),
    })).repartition(2)

    full = (shuffle_join(left, right, on="k", right_on="rk", how="outer")
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert full["k"].tolist() == [1, 2, 3, 4]  # coalesced key, both sides
    assert full["lv"].tolist()[:3] == [10, 20, 30] and pd.isna(full["lv"][3])
    assert pd.isna(full["rv"][0]) and full["rv"].tolist()[1:] == [200, 300, 400]

    rgt = (shuffle_join(left, right, on="k", right_on="rk", how="right")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert rgt["k"].tolist() == [2, 3, 4]
    assert pd.isna(rgt["lv"][2]) and rgt["rv"].tolist() == [200, 300, 400]


def test_range_join_shuffle_matches_broadcast(ray_session):
    """Grid-partitioned interval join must equal the broadcast variant on
    identical inputs, including ranges spanning many cells, empty ranges,
    and boundary timestamps (start inclusive, end exclusive)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from xhs_ocr_ray.stages.joins import (range_join_broadcast,
                                          range_join_shuffle)

    rng = np.random.default_rng(21)
    n = 400
    ts = rng.integers(0, 10_000, n) * 1000  # µs
    left = pa.table({
        "row_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
    })
    ranges = pa.table({
        "range_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "start_ts": pa.array([0, 2_000_000, 2_500_000, 9_000_000,
                              5_000_000], pa.int64()).cast(pa.timestamp("us")),
        # range 3 is empty (end == start); range 0 spans many 0.5s cells
        "end_ts": pa.array([4_000_000, 3_000_000, 2_500_001, 9_000_000,
                            5_500_000], pa.int64()).cast(pa.timestamp("us")),
    })
    want = (
        range_join_broadcast(
            ray.data.from_arrow(left).repartition(4), ranges,
            ts_col="ts", start_col="start_ts", end_col="end_ts",
            range_cols=["range_id"])
        .to_pandas()[["row_id", "range_id"]]
        .sort_values(["row_id", "range_id"]).reset_index(drop=True)
    )
    assert len(want) > 0
    for grid in (500_000, 3_000_000):  # cells smaller and larger than spans
        got = (
            range_join_shuffle(
                ray.data.from_arrow(left).repartition(4),
                ray.data.from_arrow(ranges).repartition(2),
                ts_col="ts", start_col="start_ts", end_col="end_ts",
                range_cols=["range_id"], grid_us=grid)
            .to_pandas()[["row_id", "range_id"]]
            .sort_values(["row_id", "range_id"]).reset_index(drop=True)
        )
        assert got.equals(want), f"grid={grid}"


def test_bloom_prefilter_never_drops_matches(ray_session):
    """Composed bloom-prefilter + exact join == unfiltered join; most
    non-matching rows are dropped before any exchange."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from xhs_ocr_ray.stages.bloom import bloom_prefilter, build_bloom
    from xhs_ocr_ray.stages.joins import shuffle_join

    keys = np.arange(0, 5000, 7)  # selective side: 715 keys
    small = ray.data.from_arrow(pa.table({
        "sk": pa.array(keys, pa.int64()),
        "sv": pa.array(keys * 2, pa.int64()),
    })).repartition(3)
    big = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(5000), pa.int64()),
        "v": pa.array(np.arange(5000) + 10, pa.int64()),
    })).repartition(5)

    words = build_bloom(small, "sk", n_bits=1 << 16)
    pre = bloom_prefilter(big, "k", words).materialize()
    # no false negatives: every true match survives the prefilter
    want = (shuffle_join(big, small, on="k", right_on="sk", how="inner")
            .to_pandas().sort_values("k").reset_index(drop=True))
    got = (shuffle_join(pre, small, on="k", right_on="sk", how="inner")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.equals(want) and len(got) == len(keys)
    # and the prefilter actually thinned the non-matching 85%
    assert len(keys) <= pre.count() < 5000 * 0.5

    import pytest

    with pytest.raises(ValueError):
        build_bloom(small, "sk", n_bits=1000)  # not a power of two
