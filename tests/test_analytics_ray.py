"""keyed_window / rollup_aggregate (stages/analytics.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(table: pa.Table, blocks: int = 4):
    import ray.data

    return ray.data.from_arrow(table) if blocks <= 1 else (
        ray.data.from_arrow(table).repartition(blocks)
    )


def _events(n: int = 200, keys: int = 9) -> pa.Table:
    rng = np.random.default_rng(11)
    return pa.table({
        "user": pa.array((np.arange(n) * 13) % keys, pa.int64()),
        "seq": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64()),
    })


def _expected_windows(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user", "seq"]).reset_index(drop=True)
    g = df.groupby("user", sort=False)
    return df.assign(
        prev_v=g["v"].shift(1).astype("Int64"),
        next_v=g["v"].shift(-1).astype("Int64"),
        run_v=g["v"].cumsum(),
        rn=(g.cumcount() + 1).astype("int64"),
        avg3=g["v"].rolling(3, min_periods=1).mean().reset_index(drop=True),
    )


def test_keyed_window_matches_pandas(ray_session):
    from xhs_ocr_ray.stages.analytics import keyed_window

    t = _events()
    want = _expected_windows(t.to_pandas())
    for blocks in (1, 16):
        res = keyed_window(
            _mk(t, blocks), ["user"], ["seq"],
            [("lag", "v", 1, "prev_v"), ("lead", "v", 1, "next_v"),
             ("cumsum", "v", "run_v"), ("row_number", "rn"),
             ("rolling_mean", "v", 3, "avg3")],
        )
        # integer lag/lead stay int64-with-nulls at the ARROW layer (ids
        # >= 2^53 survive); only the pandas VIEW shows float64 for nulls
        sch = res.schema()
        types = dict(zip(sch.names, sch.types))
        assert str(types["prev_v"]) == "int64"
        assert str(types["run_v"]) == "int64"
        out = (
            res.to_pandas().sort_values(["user", "seq"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out[want.columns.tolist()], want, check_dtype=False)


def test_keyed_window_rejects_unknown_op(ray_session):
    import pytest

    from xhs_ocr_ray.stages.analytics import keyed_window

    with pytest.raises(ValueError):
        keyed_window(_mk(_events(8)), ["user"], ["seq"], [("median", "v", "m")])


def test_rollup_matches_pandas(ray_session):
    from xhs_ocr_ray.stages.analytics import rollup_aggregate

    n = 300
    rng = np.random.default_rng(5)
    t = pa.table({
        "a": pa.array([f"a{i % 3}" for i in range(n)]),
        "b": pa.array([f"b{i % 4}" for i in range(n)]),
        "id": pa.array(np.arange(n), pa.int64()),
        "x": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    df = t.to_pandas()

    def agg(keys):
        if keys:
            g = df.groupby(keys, sort=False)
            out = pd.DataFrame({
                "n": g["id"].count().astype("int64"),
                "sx": g["x"].sum(),
                "mx": g["x"].max(),
            }).reset_index()
        else:
            out = pd.DataFrame(
                {"n": [len(df)], "sx": [df.x.sum()], "mx": [df.x.max()]})
        for c in ("a", "b"):
            if c not in out:
                out[c] = pd.Series([None] * len(out), dtype="object")
        return out[["a", "b", "n", "sx", "mx"]]

    want = (
        pd.concat([agg(["a", "b"]), agg(["a"]), agg([])], ignore_index=True)
        .sort_values(["a", "b"], na_position="last").reset_index(drop=True)
    )
    for blocks in (1, 16):
        out = (
            rollup_aggregate(
                _mk(t, blocks), ["a", "b"],
                {"n": ("id", "count"), "sx": ("x", "sum"), "mx": ("x", "max")},
            )
            .to_pandas()
            .sort_values(["a", "b"], na_position="last")
            .reset_index(drop=True)
        )
        assert len(out) == len(want)  # 12 finest + 3 + 1
        pd.testing.assert_frame_equal(
            out[["a", "b", "n", "sx", "mx"]], want, check_dtype=False)


def test_rollup_rejects_unknown_agg(ray_session):
    import pytest

    from xhs_ocr_ray.stages.analytics import rollup_aggregate

    with pytest.raises(ValueError):
        rollup_aggregate(_mk(_events(8)), ["user"], {"m": ("v", "median")})
