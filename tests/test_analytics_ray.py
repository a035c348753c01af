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


def _abx(n: int = 240) -> pa.Table:
    rng = np.random.default_rng(3)
    return pa.table({
        "a": pa.array([f"a{i % 3}" for i in range(n)]),
        "b": pa.array([f"b{i % 4}" for i in range(n)]),
        "x": pa.array(rng.integers(0, 100, n), pa.int64()),
    })


def test_cube_matches_pandas(ray_session):
    from xhs_ocr_ray.stages.analytics import cube_aggregate

    t = _abx()
    df = t.to_pandas()

    def agg(keys):
        if keys:
            out = (df.groupby(keys, sort=False)["x"].sum()
                   .reset_index(name="sx"))
        else:
            out = pd.DataFrame({"sx": [df.x.sum()]})
        for c in ("a", "b"):
            if c not in out:
                out[c] = pd.Series([None] * len(out), dtype="object")
        return out[["a", "b", "sx"]]

    want = (
        pd.concat([agg(["a", "b"]), agg(["a"]), agg(["b"]), agg([])],
                  ignore_index=True)
        .sort_values(["a", "b"], na_position="last").reset_index(drop=True)
    )
    out = (
        cube_aggregate(_mk(t, 8), ["a", "b"], {"sx": ("x", "sum")})
        .to_pandas().sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == 12 + 3 + 4 + 1
    pd.testing.assert_frame_equal(out[["a", "b", "sx"]], want,
                                  check_dtype=False)


def test_grouping_sets_dedupes_and_validates(ray_session):
    import pytest

    from xhs_ocr_ray.stages.analytics import grouping_sets_aggregate

    t = _abx(60)
    out = grouping_sets_aggregate(
        _mk(t), ["a", "b"], [["a"], ["a"]], {"sx": ("x", "sum")}
    ).to_pandas()
    assert len(out) == 3  # duplicate set emitted once
    with pytest.raises(ValueError):
        grouping_sets_aggregate(_mk(t), ["a"], [["zz"]], {"sx": ("x", "sum")})


def test_pivot_counts_and_sums(ray_session):
    from xhs_ocr_ray.stages.analytics import pivot_aggregate

    t = _abx()
    df = t.to_pandas()
    vals = ["b0", "b1", "b3"]  # b2 deliberately excluded from the domain
    want_n = (
        df[df.b.isin(vals)].groupby(["a", "b"]).size().unstack("b")
        .reindex(columns=vals, fill_value=0).astype("int64")
    )
    for blocks in (1, 16):
        out = (
            pivot_aggregate(_mk(t, blocks), ["a"], "b", vals)
            .to_pandas().sort_values("a").set_index("a")
        )
        for v in vals:
            assert out[f"n_{v}"].tolist() == want_n[v].tolist()
    want_s = (
        df[df.b.isin(vals)].groupby(["a", "b"])["x"].sum().unstack("b")
        .reindex(columns=vals, fill_value=0)
    )
    out = (
        pivot_aggregate(_mk(t, 8), ["a"], "b", vals, value_col="x",
                        how="sum", out_prefix="sx_")
        .to_pandas().sort_values("a").set_index("a")
    )
    for v in vals:
        assert out[f"sx_{v}"].tolist() == want_s[v].tolist()


def test_quantile_threshold_filter_exact(ray_session):
    import math

    from xhs_ocr_ray.stages.analytics import quantile_threshold_filter

    rng = np.random.default_rng(9)
    n = 500
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "score": pa.array(rng.integers(0, 40, n), pa.int64()),
    })
    scores = np.sort(t.column("score").to_numpy())
    for q in (0.25, 0.75, 1.0):
        want_t = scores[math.ceil(q * n) - 1]  # quantile_disc
        out, thr = quantile_threshold_filter(_mk(t, 8), "score", q)
        assert thr == want_t
        got = out.to_pandas()
        assert (got["score"] >= want_t).all()
        assert len(got) == int((scores >= want_t).sum())
    out, thr = quantile_threshold_filter(_mk(t, 8), "score", 0.5, keep="lt")
    got = out.to_pandas()
    assert (got["score"] < thr).all()


def test_stratified_hash_sample(ray_session):
    import pytest

    from xhs_ocr_ray.functions.hashing import md5_hex
    from xhs_ocr_ray.stages.sampling import stratified_hash_sample

    n = 400
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array([["en", "zh", "fr", "de"][i % 4] for i in range(n)]),
        "text": pa.array([f"doc number {i} payload" for i in range(n)]),
    })
    thr = {"en": "8000", "zh": "4000"}
    out = stratified_hash_sample(
        _mk(t, 8), strata_col="lang", content_col="text",
        thresholds=thr, default="0000",
    ).to_pandas()
    df = t.to_pandas()
    want = df[[md5_hex(x)[:4] < thr.get(s, "0000")
               for s, x in zip(df.lang, df.text)]]
    assert sorted(out.id) == sorted(want.id)
    assert set(out.lang) <= {"en", "zh"}  # default '0000' drops fr/de
    # determinism: same rows on a different block split
    out2 = stratified_hash_sample(
        _mk(t, 1), strata_col="lang", content_col="text",
        thresholds=thr, default="0000").to_pandas()
    assert sorted(out2.id) == sorted(out.id)
    with pytest.raises(ValueError):
        stratified_hash_sample(_mk(t), strata_col="lang",
                               content_col="text", thresholds={"en": "80"})


def test_hll_count_distinct(ray_session):
    import pytest

    from xhs_ocr_ray.stages.sketches import hll_count_distinct, hll_estimate

    n_distinct = 2000
    ids = np.concatenate([np.arange(n_distinct), np.arange(500)])  # + dups
    t = pa.table({"v": pa.array(ids, pa.int64())})
    est1 = hll_count_distinct(_mk(t, 1), "v")
    est16 = hll_count_distinct(_mk(t, 16), "v")
    assert est1 == est16  # deterministic: block split cannot move the estimate
    assert abs(est1 - n_distinct) / n_distinct < 0.05

    # nulls are skipped (count(DISTINCT col) semantics)
    tn = pa.table({"v": pa.array([1, None, 2, None, 1], pa.int64())})
    small = hll_count_distinct(_mk(tn, 2), "v")
    assert 0 < small < 10

    # empty input estimates zero (linear-counting branch, V = m)
    assert hll_count_distinct(_mk(t.slice(0, 0), 1), "v") == 0.0

    with pytest.raises(ValueError):
        hll_count_distinct(_mk(t), "v", p=2)

    # estimator unit check: one filled register at rank 1, p=12
    e = hll_estimate(np.array([5]), np.array([1]), 12)
    assert e > 0


def test_grouped_string_agg(ray_session):
    from xhs_ocr_ray.stages.analytics import grouped_string_agg

    t = pa.table({
        "k": pa.array([1, 2, 1, 1, 2], pa.int64()),
        "o": pa.array([3, 1, 1, 2, 2], pa.int64()),
        "v": pa.array(["c", "x", "a", "b", "y"]),
    })
    for blocks in (1, 4):
        out = (
            grouped_string_agg(_mk(t, blocks), ["k"], "v", ["o"],
                               sep="|", out_col="s")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert out["s"].tolist() == ["a|b|c", "x|y"]


def test_target_mix_sample(ray_session):
    import ray.data
    import pytest

    from xhs_ocr_ray.stages.sampling import target_mix_sample

    # 400 web / 100 code / 300 junk docs with distinct texts
    rows = (
        [{"doc_id": i, "source": "web", "text": f"web doc {i} {i*7}"}
         for i in range(400)]
        + [{"doc_id": 1000 + i, "source": "code", "text": f"code {i} x{i}"}
           for i in range(100)]
        + [{"doc_id": 2000 + i, "source": "junk", "text": f"junk {i}"}
           for i in range(300)]
    )
    ds = ray.data.from_items(rows, override_num_blocks=4)
    out = target_mix_sample(
        ds, group_col="source", content_col="text",
        targets={"web": 0.5, "code": 0.5}).to_pandas()
    vc = out.source.value_counts()
    # code (100/0.5=200) binds → kept whole; web downsamples toward 100
    assert vc.get("code", 0) == 100
    assert 80 <= vc.get("web", 0) <= 120
    assert "junk" not in vc.index
    # deterministic: second run keeps the identical doc_id set
    out2 = target_mix_sample(
        ds, group_col="source", content_col="text",
        targets={"web": 0.5, "code": 0.5}).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)
    # explicit counts skip the measure pass and give the same answer
    out3 = target_mix_sample(
        ds, group_col="source", content_col="text",
        targets={"web": 0.5, "code": 0.5},
        counts={"web": 400, "code": 100, "junk": 300}).to_pandas()
    assert sorted(out3.doc_id) == sorted(out.doc_id)

    with pytest.raises(ValueError, match="positive"):
        target_mix_sample(ds, group_col="source", content_col="text",
                          targets={"web": 0.0})
    with pytest.raises(ValueError, match="no target group"):
        target_mix_sample(ds, group_col="source", content_col="text",
                          targets={"nope": 1.0}, counts={"web": 1})


def test_unigram_logprob(ray_session):
    import math

    import ray.data

    from xhs_ocr_ray.stages.text_analysis import unigram_logprob

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "a a b"},
        {"doc_id": 2, "text": "a rare"},
        {"doc_id": 3, "text": ""},
    ], override_num_blocks=2)
    out = unigram_logprob(ds).to_pandas().set_index("doc_id").sort_index()
    # corpus: a=3, b=1, rare=1, total=5
    assert out.index.tolist() == [1, 2]  # empty doc emits nothing
    lp = {c: math.floor(math.log(n / 5.0) * 1_000_000)
          for c, n in {"a": 3, "b": 1, "rare": 1}.items()}
    assert out.loc[1, "logprob_micro"] == 2 * lp["a"] + lp["b"]
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[2, "logprob_micro"] == lp["a"] + lp["rare"]
    # doc 2 has the rarer mix → lower mean log-prob
    assert (out.loc[2, "mean_logprob_micro"]
            < out.loc[1, "mean_logprob_micro"])


def test_cms_estimate(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.sketches import cms_estimate

    rows = ([{"v": "hot"}] * 500 + [{"v": "warm"}] * 40 + [{"v": "cold"}] * 3
            + [{"v": None}] * 5)
    ds = ray.data.from_items(rows, override_num_blocks=4)
    out = cms_estimate(ds, "v", ["hot", "warm", "cold", "absent"],
                       depth=4, width=1024)
    got = dict(zip(out.column("probe").to_pylist(),
                   out.column("est").to_pylist()))
    # CMS never undercounts; with 3 values in 1024 buckets there are no
    # collisions, so estimates are exact here
    assert got == {"hot": 500, "warm": 40, "cold": 3, "absent": 0}
    # tiny width forces collisions: estimates only ever overcount
    small = cms_estimate(ds, "v", ["hot", "warm", "cold", "absent"],
                         depth=2, width=2)
    s = dict(zip(small.column("probe").to_pylist(),
                 small.column("est").to_pylist()))
    assert s["hot"] >= 500 and s["warm"] >= 40 and s["cold"] >= 3


def test_sampled_quantiles(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.analytics import sampled_quantiles
    import pytest

    rows = [{"k": str(i), "v": float(i)} for i in range(2000)]
    ds = ray.data.from_items(rows, override_num_blocks=4)
    # target >= data: rate 1.0 keeps everything -> exact quantile_disc
    out = sampled_quantiles(ds, value_col="v", key_col="k",
                            qs=[0.5, 0.95], target_sample=10_000)
    got = dict(zip(out.column("q").to_pylist(),
                   out.column("value").to_pylist()))
    assert got[0.5] == 999.0 and got[0.95] == 1899.0
    # bounded sample: estimates land near the true ranks, deterministic
    s1 = sampled_quantiles(ds, value_col="v", key_col="k",
                           qs=[0.5], target_sample=256)
    s2 = sampled_quantiles(ds, value_col="v", key_col="k",
                           qs=[0.5], target_sample=256)
    v = s1.column("value").to_pylist()[0]
    assert s1.equals(s2)
    assert 800 <= v <= 1200
    # empty input and bad qs
    empty = sampled_quantiles(ds.filter(lambda r: False),
                              value_col="v", key_col="k", qs=[0.5])
    assert empty.num_rows == 0
    with pytest.raises(ValueError):
        sampled_quantiles(ds, value_col="v", key_col="k", qs=[0.0])


def test_bucketed_exchange_sparse_buckets_keep_schema(ray_session):
    """group_apply (the groupby('__kb') replacement) must emit TYPED blocks
    even for empty sorted partitions — zero-column blocks from Ray's
    map_groups were the source of the 'RefBundle with a different schema'
    warnings (r05). With 2 keys spread over 8 blocks, most partitions are
    empty; every output block must still carry the output columns."""
    import ray
    import ray.data

    from xhs_ocr_ray.stages.dedup import exact_dedup

    rows = [{"k": f"k{i % 2}", "ord": i, "v": f"v{i}"} for i in range(8)]
    ds = ray.data.from_items(rows, override_num_blocks=8)
    mat = exact_dedup(ds, ["k"], "ord").materialize()
    df = mat.to_pandas().sort_values("k")
    assert df["ord"].tolist() == [0, 1]
    # every block CARRYING ROWS has the full output schema; Ray's sort may
    # still emit 0-row 0-column bundles that skip map stages — harmless
    # (and warning-free: the gate run asserts zero RefBundle warnings)
    for ref in mat.get_internal_block_refs():
        b = ray.get(ref)
        if len(b) == 0:
            continue
        cols = (list(b.columns) if hasattr(b, "columns")
                else b.schema.names)
        assert cols == ["k", "ord", "v"], cols
