"""Typed per-format sidecar readers (S4 variants) + interval scheduler."""

import json

from xhs_ocr_ray.sources.sidecar_formats import (
    MISSING,
    parse_path_meta,
    parse_user_info,
    typed_user_info,
)


def test_parse_path_meta():
    assert parse_path_meta("/c/tiktok/2024-01-05/1.2.3.4#acct9/user_info.json") \
        == ("1.2.3.4", "acct9", "2024-01-05")
    # no '#' → empty account (the reference's '无' case)
    assert parse_path_meta("/c/weibo/2024-01-05/1.2.3.4/user_info.json") \
        == ("1.2.3.4", "", "2024-01-05")


def test_tiktok_fields():
    rec = parse_user_info(
        "tiktok", "/c/2024-01-05/ip#a1/user_info.json",
        json.dumps({"share_link": "https://t/x", "nickname": "nick",
                    "follow_count": 10, "follower_count": 20, "like_count": 30}),
    )
    assert rec["follows"] == 10 and rec["fans"] == 20 and rec["interaction"] == 30
    assert rec["profile_url"] == "https://t/x" and rec["status"] == "ok"


def test_weibo_has_no_interaction():
    rec = parse_user_info(
        "weibo", "/c/2024-01-05/ip#a1/user_info.json",
        {"share_link": "s", "nickname": "n", "follow_count": "7",
         "follower_count": "8", "like_count": 99},  # like_count must be ignored
    )
    assert rec["follows"] == 7 and rec["fans"] == 8
    assert rec["interaction"] == MISSING


def test_xhs_chinese_numbers():
    rec = parse_user_info(
        "xhs", "/c/2024-01-05/ip#a1/profile_url.json",
        {"user_profile_url": "u", "nickname": "n", "following_count": "1.5万",
         "fans": "3万", "likes_collect_count": "120"},
    )
    assert rec["follows"] == 15000 and rec["fans"] == 30000
    assert rec["interaction"] == 120


def test_invalid_nickname_kept_with_status():
    rec = parse_user_info("tiktok", "/c/d/ip#a/user_info.json",
                          {"follow_count": 1})
    assert rec["status"] == "invalid" and rec["nickname"] == ""


def test_wrong_filename_and_garbage_skipped():
    assert parse_user_info("xhs", "/c/d/ip#a/user_info.json", "{}") is None
    assert parse_user_info("tiktok", "/c/d/ip#a/user_info.json", "not json") is None
    assert parse_user_info("tiktok", "/c/d/ip#a/user_info.json", "[1,2]") is None


def test_typed_user_info_ray(ray_session):
    import ray.data

    rows = [
        {"app": "tiktok", "path": "/c/2024-01-05/ip#a1/user_info.json",
         "payload": json.dumps({"nickname": "t", "follow_count": 1,
                                "follower_count": 2, "like_count": 3,
                                "share_link": "s"})},
        {"app": "xhs", "path": "/c/2024-01-06/ip2#a2/profile_url.json",
         "payload": json.dumps({"nickname": "x", "following_count": "2万",
                                "fans": "5", "likes_collect_count": "",
                                "user_profile_url": "u"})},
        {"app": "weibo", "path": "/c/2024-01-07/ip3#a3/other.json",
         "payload": "{}"},  # wrong filename → dropped
    ]
    out = typed_user_info(ray.data.from_items(rows)).to_pandas()
    out = out.sort_values("app").reset_index(drop=True)
    assert list(out["app"]) == ["tiktok", "xhs"]
    assert list(out["follows"]) == [1, 20000]
    assert list(out["interaction"]) == [3, MISSING]
    assert list(out["account_id"]) == ["a1", "a2"]


def test_scheduler_due_runs_and_catchup():
    from xhs_ocr_ray.scheduler import due_runs

    # first launch: only the latest tick
    assert due_runs(None, 1005.0, 100.0) == [1000.0]
    # steady state: one elapsed tick
    assert due_runs(1000.0, 1105.0, 100.0) == [1100.0]
    # downtime: catch up all missed ticks in order
    assert due_runs(1000.0, 1350.0, 100.0) == [1100.0, 1200.0, 1300.0]
    # bounded catch-up keeps the newest ticks
    assert due_runs(0.0, 10_000.0, 100.0, max_catchup=3) == [9800.0, 9900.0, 10000.0]
    assert due_runs(1000.0, 1050.0, 100.0) == []


def test_scheduler_run_periodic_no_sleep(tmp_path):
    from xhs_ocr_ray.scheduler import run_periodic

    clock = {"t": 1005.0}
    ran: list[float] = []

    def fake_sleep(s):
        clock["t"] += s

    state = str(tmp_path / "sched.json")
    n = run_periodic(ran.append, 100.0, max_runs=3, state_path=state,
                     now=lambda: clock["t"], sleep=fake_sleep)
    assert n == 3 and ran == [1000.0, 1100.0, 1200.0]
    # restart after downtime: catch-up from the persisted state
    clock["t"] = 1460.0
    ran2: list[float] = []
    n2 = run_periodic(ran2.append, 100.0, max_runs=2, state_path=state,
                      now=lambda: clock["t"], sleep=fake_sleep)
    assert n2 == 2 and ran2 == [1300.0, 1400.0]


def test_scheduler_daily_at_time_grid_and_catchup(tmp_path):
    """--at HH:MM mode: ticks land exactly on HH:MM local each day, with
    the same persisted catch-up machinery as the interval mode (reference
    daily branch, social_ocr.py:132-141). Simulated clock — never sleeps."""
    import datetime

    from xhs_ocr_ray.scheduler import daily_anchor, run_periodic

    day = 86400.0
    # a known local wall-clock instant: today 05:00 local
    base = datetime.datetime(2026, 3, 1, 5, 0).timestamp()
    anchor = daily_anchor("06:30", now=base)
    assert datetime.datetime.fromtimestamp(anchor).strftime("%H:%M") == "06:30"

    clock = {"t": base}
    ran: list[float] = []

    def fake_sleep(s):
        clock["t"] += s

    state = str(tmp_path / "sched.json")
    n = run_periodic(ran.append, day, anchor=anchor, max_runs=3,
                     state_path=state, now=lambda: clock["t"],
                     sleep=fake_sleep)
    assert n == 3
    # every tick is exactly on the 06:30 local grid, on consecutive days
    stamps = [datetime.datetime.fromtimestamp(t) for t in ran]
    assert all(s.strftime("%H:%M:%S") == "06:30:00" for s in stamps)
    assert [(b - a).total_seconds() for a, b in zip(stamps, stamps[1:])] \
        == [day, day]
    # restart after 2.5 days of downtime: missed daily windows replay
    clock["t"] = ran[-1] + 2.5 * day
    ran2: list[float] = []
    n2 = run_periodic(ran2.append, day, anchor=anchor, max_runs=2,
                      state_path=state, now=lambda: clock["t"],
                      sleep=fake_sleep)
    assert n2 == 2 and ran2 == [ran[-1] + day, ran[-1] + 2 * day]


def test_daily_anchor_rejects_bad_input():
    import pytest

    from xhs_ocr_ray.scheduler import daily_anchor

    for bad in ("6:99", "24:00", "noon", "06", "06:30:00"):
        with pytest.raises(ValueError, match="HH:MM"):
            daily_anchor(bad, now=0.0)


def test_extract_dataset_remote_args(ray_session):
    """A2 analog: resource knobs plumb through to the actor pool."""
    import ray.data

    from xhs_ocr_ray.pipelines.extract_pages import extract_dataset
    from xhs_ocr_ray.sources.golden import golden_corpus
    from xhs_ocr_ray.sources.pages import PAGES_SCHEMA

    import pyarrow as pa

    rows = golden_corpus()[:3]
    tbl = pa.Table.from_pylist(
        [{**r, "warc_ts": r["warc_ts"]} for r in rows]
    ).cast(PAGES_SCHEMA)
    out = extract_dataset(ray.data.from_arrow(tbl), concurrency=(1, 2),
                          batch_size=2, ray_remote_args={"num_cpus": 0.5})
    assert out.count() == 3


def test_typed_post_data_explodes_and_enriches(ray_session):
    import ray.data

    from xhs_ocr_ray.sources.sidecar_formats import typed_post_data

    rows = [
        {"app": "weibo", "path": "/c/2024-01-09/9.9.9.9#w1/weibo_data.json",
         "payload": json.dumps([{"title": "p1", "views": 5},
                                {"title": "p2", "views": 7}])},
        {"app": "tiktok", "path": "/c/2024-01-10/8.8.8.8#t1/post_data.json",
         "payload": json.dumps([{"title": "p3"}])},
        {"app": "weibo", "path": "/c/2024-01-09/ip#w1/user_info.json",
         "payload": json.dumps([{"title": "wrong file"}])},  # dropped
        {"app": "tiktok", "path": "/c/2024-01-10/ip#t1/post_data.json",
         "payload": json.dumps({"not": "a list"})},  # dropped
    ]
    out = typed_post_data(ray.data.from_items(rows)).to_pandas()
    out = out.sort_values(["app", "post_json"]).reset_index(drop=True)
    assert len(out) == 3
    assert list(out["account_id"]) == ["t1", "w1", "w1"]
    p1 = json.loads(out.iloc[1]["post_json"])
    # the reference appends device_ip + collect_time to every post dict
    assert p1["device_ip"] == "9.9.9.9" and p1["collect_time"] == "2024-01-09"
    assert p1["title"] == "p1" and p1["views"] == 5


def test_cn_garbage_counts_are_missing():
    # parse_cn_number maps garbage to 0.0; the sidecar reader must map it to
    # MISSING, not a real zero
    rec = parse_user_info(
        "xhs", "/c/2024-01-05/ip#a1/profile_url.json",
        {"user_profile_url": "u", "nickname": "n", "following_count": "私密",
         "fans": "0", "likes_collect_count": "0万"},
    )
    assert rec["follows"] == MISSING  # garbage
    assert rec["fans"] == 0           # genuine zero
    assert rec["interaction"] == 0    # genuine zero with unit


def test_read_jsonl_tolerant(ray_session, tmp_path):
    import pyarrow as pa

    from xhs_ocr_ray.sources.jsonl import read_jsonl_tolerant

    p = tmp_path / "rows.jsonl"
    p.write_text("\n".join([
        '{"id": 1, "name": "a", "n": 5}',
        '{"id": "2", "name": "b"}',          # numeric string coerced, n null
        'not json at all',                    # invalid -> quarantined
        '[1, 2, 3]',                          # non-object -> quarantined
        '{"id": 4, "name": 7, "n": "x"}',    # name jsonified, n uncoercible
    ]) + "\n")
    out = read_jsonl_tolerant(str(p), {
        "id": pa.int64(), "name": pa.string(), "n": pa.int64(),
    }).to_pandas().sort_values("id", na_position="last").reset_index(drop=True)
    assert out.status.tolist() == ["ok", "ok", "invalid", "invalid", "invalid"]
    assert out.id.dropna().astype(int).tolist() == [1, 2, 4]
    assert out.loc[2, "name"] == "7"  # non-string field jsonified, row flagged
    assert out.n.dropna().astype(int).tolist() == [5]


def test_read_csv_tolerant(ray_session, tmp_path):
    import pyarrow as pa

    from xhs_ocr_ray.sources.jsonl import read_csv_tolerant

    p = tmp_path / "rows.csv"
    p.write_text("\n".join([
        "id,name,n",
        "1,a,5",
        '2,"quoted, name",',   # quoted comma + empty n -> null, still ok
        "3,b",                  # short row -> quarantined
        "4,c,notanint",         # uncoercible -> quarantined
        "5,d,6,extra",          # long row -> quarantined
    ]) + "\n")
    out = read_csv_tolerant(str(p), {
        "id": pa.int64(), "name": pa.string(), "n": pa.int64(),
    }).to_pandas().sort_values("id", na_position="last").reset_index(drop=True)
    assert out.status.tolist() == ["ok", "ok", "invalid", "invalid", "invalid"]
    assert out.name.tolist()[:2] == ["a", "quoted, name"]
    assert out.n.dropna().astype(int).tolist() == [5]


def test_read_warc_pages(ray_session, tmp_path):
    from xhs_ocr_ray.sources.warc import (encode_warc, read_warc_pages,
                                          _parse_warc)

    recs = [
        ("https://a.example/x", "2024-01-05T00:00:00Z", b"<html>A</html>"),
        ("https://b.example/y", "2024-02-06T12:30:00Z", "<p>中文</p>".encode()),
    ]
    plain = tmp_path / "c.warc"
    plain.write_bytes(encode_warc(recs, per_record_gzip=False))
    gz = tmp_path / "c.warc.gz"
    gz.write_bytes(encode_warc(recs, per_record_gzip=True))
    for p in (plain, gz):
        out = read_warc_pages(str(p)).to_pandas().sort_values("url") \
            .reset_index(drop=True)
        assert out.url.tolist() == ["https://a.example/x", "https://b.example/y"]
        assert out.html.tolist() == [r[2] for r in recs]
        assert out.warc_ts.dt.month.tolist() == [1, 2]
        assert (out.text == "").all() and (out.lang == "").all()
    # non-response records skipped; damaged tail tolerated
    data = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 2\r\n\r\nok"
            b"\r\n\r\n") + encode_warc(recs[:1], per_record_gzip=False) \
        + b"GARBAGE TRAILING BYTES"
    rows = list(_parse_warc(data))
    assert [r[0] for r in rows] == ["https://a.example/x"]


def test_read_arrow_ipc_tolerant(ray_session, tmp_path):
    import pyarrow as pa

    from xhs_ocr_ray.sources.jsonl import read_arrow_ipc_tolerant

    good = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int32()),   # narrower type: cast
        "extra": ["x", "y"],                         # undeclared: dropped
    })
    p1 = tmp_path / "a.arrow"
    with pa.OSFile(str(p1), "wb") as f, pa.ipc.new_file(f, good.schema) as w:
        w.write_table(good)
    p2 = tmp_path / "broken.arrow"
    p2.write_bytes(b"not arrow at all")

    schema = {"event_id": pa.int64(), "user_id": pa.int64(),
              "missing_col": pa.string()}
    out = (read_arrow_ipc_tolerant([str(p1), str(p2)], schema)
           .to_pandas().sort_values("status").reset_index(drop=True))
    assert len(out) == 3
    invalid = out[out.status == "invalid"]
    assert len(invalid) == 1 and invalid.event_id.isna().all()
    ok = out[out.status == "ok"].sort_values("event_id")
    assert ok.event_id.tolist() == [1, 2]
    assert ok.user_id.tolist() == [10, 20]          # cast int32 -> int64
    assert ok.missing_col.isna().all()              # typed nulls
    assert "extra" not in out.columns


def test_read_jsonl_pages(ray_session, tmp_path):
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join([
        '{"url": "https://a.com/x", "warc_ts": "2024-01-15T10:00:00",'
        ' "html": "<p>hi</p>", "lang": "en"}',
        'this is not json',
        '{"url": "https://a.com/y", "warc_ts": "not a time",'
        ' "html": "<p>bad ts</p>", "lang": "en"}',
        '{"url": "https://a.com/z", "warc_ts": "2024-01-15T11:30:00",'
        ' "html": "<p>ok</p>", "lang": "zh"}',
    ]))
    from xhs_ocr_ray.sources.jsonl import read_jsonl_pages

    out = (read_jsonl_pages(str(p)).to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert out.url.tolist() == ["https://a.com/x", "https://a.com/z"]
    assert out.html.tolist() == [b"<p>hi</p>", b"<p>ok</p>"]
    assert str(out.warc_ts[0]) == "2024-01-15 10:00:00"
    # audit mode keeps quarantined rows
    kept = read_jsonl_pages(str(p), drop_invalid=False).to_pandas()
    assert sorted(kept.status.tolist()) == ["invalid", "invalid", "ok", "ok"]
