"""grouped_topk / grouped_quantiles (stages/ranking.py) and tfidf_topk
(stages/text_analysis.py)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(table: pa.Table, blocks: int = 4):
    import ray.data

    return ray.data.from_arrow(table) if blocks <= 1 else (
        ray.data.from_arrow(table).repartition(blocks)
    )


def test_grouped_topk_ranks_and_ties(ray_session):
    from xhs_ocr_ray.stages.ranking import grouped_topk

    t = pa.table({
        "g": ["a"] * 5 + ["b"] * 2,
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "v": pa.array([10.0, 30.0, 30.0, 20.0, 5.0, 1.0, 2.0], pa.float64()),
    })
    out = (
        grouped_topk(_mk(t), ["g"], "v", 3, descending=True,
                     tie_cols=("id",), rank_col="rnk")
        .to_pandas().sort_values(["g", "rnk"]).reset_index(drop=True)
    )
    # group a: 30@id2, 30@id3 (tie → lower id first), 20@id4
    assert out[out.g == "a"]["id"].tolist() == [2, 3, 4]
    assert out[out.g == "a"]["rnk"].tolist() == [1, 2, 3]
    # group b has only 2 rows → 2 ranks
    assert out[out.g == "b"]["id"].tolist() == [7, 6]
    assert out["rnk"].dtype == np.int64


def test_grouped_topk_combiner_is_lossless_across_blocks(ray_session):
    """The global per-key top-k must not depend on how rows split into
    blocks (the per-batch combiner keeps local top-k per key)."""
    from xhs_ocr_ray.stages.ranking import grouped_topk

    rng = np.random.default_rng(7)
    n = 500
    t = pa.table({
        "g": pa.array([f"g{i % 7}" for i in range(n)]),
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 50, n).astype("float64")),
    })
    df = t.to_pandas()
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g").head(4)
    )
    for blocks in (1, 16):
        out = (
            grouped_topk(_mk(t, blocks), ["g"], "v", 4, tie_cols=("id",))
            .to_pandas().sort_values(["g", "rnk"])
        )
        assert out["id"].tolist() == want["id"].tolist()


def test_grouped_quantiles_matches_duckdb_disc(ray_session):
    """quantile_disc semantics: element at 1-based rank ceil(q*n)."""
    import duckdb

    from xhs_ocr_ray.stages.ranking import grouped_quantiles

    rng = np.random.default_rng(3)
    t = pa.table({
        "g": pa.array([f"g{i % 4}" for i in range(101)]),
        "v": pa.array(rng.normal(size=101)),
    })
    out = (
        grouped_quantiles(_mk(t), ["g"], "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99})
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    tdf = t.to_pandas()  # noqa: F841 (registered view)
    want = duckdb.sql(
        "SELECT g, quantile_disc(v, 0.25) AS p25, quantile_disc(v, 0.5) AS p50,"
        " quantile_disc(v, 0.99) AS p99 FROM tdf GROUP BY g ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(out[["g", "p25", "p50", "p99"]], want)


def test_tfidf_topk_small_closed_form(ray_session):
    from xhs_ocr_ray.stages.text_analysis import tfidf_topk

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["apple apple banana", "banana cherry", "cherry cherry cherry dates"],
    })
    out = tfidf_topk(_mk(t, 2), k=3).to_pandas()
    # idf: apple ln(3/1), banana ln(3/2), cherry ln(3/2), dates ln(3/1)
    # scores: cherry@2 = 3*ln(1.5)=1.216..., apple@0 = 2*ln(3)=2.197,
    # dates@2 = ln(3)=1.0986
    assert out.iloc[0][["doc_id", "token"]].tolist() == [0, "apple"]
    assert out.iloc[0]["tfidf"] == 2 * math.log(3.0)
    assert out.iloc[1][["doc_id", "token"]].tolist() == [2, "cherry"]
    assert out.iloc[2][["doc_id", "token"]].tolist() == [2, "dates"]


def test_grouped_ntile(ray_session):
    """NTILE semantics: first n%k tiles get the extra row; per-key
    ordering with deterministic tie-break."""
    import ray.data

    from xhs_ocr_ray.stages.ranking import grouped_ntile

    rows = []
    for lang, n in [("en", 7), ("zh", 2), ("fr", 1)]:
        for i in range(n):
            rows.append({"lang": lang, "score": 100 - i,
                         "doc_id": len(rows)})
    ds = ray.data.from_items(rows, override_num_blocks=2)
    out = (grouped_ntile(ds, ["lang"], "score", 3, descending=True,
                         tie_cols=("doc_id",))
           .to_pandas().sort_values(["lang", "doc_id"]))
    en = out[out.lang == "en"]
    assert en.tile.tolist() == [1, 1, 1, 2, 2, 3, 3]  # sizes 3,2,2
    assert out[out.lang == "zh"].tile.tolist() == [1, 2]
    assert out[out.lang == "fr"].tile.tolist() == [1]

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        grouped_ntile(ds, ["lang"], "score", 0)
