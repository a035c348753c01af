"""End-to-end Ray pipeline tests: golden bytes per url, dedup, resume."""

import os
import shutil

import pyarrow as pa
import pytest

from xhs_ocr_ray.pipelines.extract_pages import (
    bucketize,
    extract_dataset,
    run_extract,
)
from xhs_ocr_ray.sources.golden import GOLDEN_PROFILES, golden_corpus, golden_key
from xhs_ocr_ray.sources.pages import PAGES_SCHEMA
from xhs_ocr_ray.stages.dedup import exact_dedup

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")


def _golden_pages_ds():
    import ray.data

    rows = golden_corpus()
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGES_SCHEMA,
    )
    return ray.data.from_arrow(table)


def test_extract_dataset_matches_goldens(ray_session):
    out = extract_dataset(
        _golden_pages_ds(), library=GOLDEN_PROFILES, concurrency=2, batch_size=4
    ).to_pandas()
    assert len(out) == len(golden_corpus())
    for _, row in out.iterrows():
        key = golden_key(row["url"])
        with open(os.path.join(GOLDEN_DIR, key + ".txt"), "rb") as f:
            want = f.read()
        got = (row["extracted_text"] or "").encode("utf-8")
        assert got == want, key


def test_extract_dataset_deterministic(ray_session):
    a = extract_dataset(_golden_pages_ds(), library=GOLDEN_PROFILES).to_pandas()
    b = extract_dataset(_golden_pages_ds(), library=GOLDEN_PROFILES).to_pandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_exact_dedup_first_wins(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [
            {"url": "u1", "warc_ts": 200, "text": "late"},
            {"url": "u1", "warc_ts": 100, "text": "early"},
            {"url": "u2", "warc_ts": 50, "text": "only"},
        ]
    )
    out = exact_dedup(ds, ["url"], "warc_ts").to_pandas().sort_values("url")
    assert out["text"].tolist() == ["early", "only"]
    assert out["warc_ts"].tolist() == [100, 50]


@pytest.fixture()
def staged_run(tmp_path, ray_session):
    import ray.data

    staged = str(tmp_path / "staged")
    out = str(tmp_path / "out")
    src = str(tmp_path / "src")
    ds = _golden_pages_ds()
    os.makedirs(src)
    ds.write_parquet(src)
    bucketize(src, staged, num_buckets=4)
    return staged, out


def test_run_extract_and_resume(staged_run):
    staged, out = staged_run
    res = run_extract(staged, out, library=GOLDEN_PROFILES, buckets_per_job=1,
                      concurrency=1, batch_size=8)
    assert res["rows_written"] == len(golden_corpus())
    assert not res["skipped"]
    # Second run (same layout): everything skipped, nothing recomputed.
    res2 = run_extract(staged, out, library=GOLDEN_PROFILES, buckets_per_job=1)
    assert res2["rows_written"] == 0
    assert sorted(res2["skipped"]) == sorted(res["processed"])
    # Invalidate one group's manifest → only that group recomputes.
    victim = res["processed"][0]
    os.unlink(os.path.join(out, "_manifests", f"group-{victim}.json"))
    res3 = run_extract(staged, out, library=GOLDEN_PROFILES, buckets_per_job=1)
    assert res3["processed"] == [victim]


def test_layout_change_invalidates_output(staged_run):
    """Changing buckets_per_job between runs must not leave stale rows."""
    import duckdb

    staged, out = staged_run
    run_extract(staged, out, library=GOLDEN_PROFILES, buckets_per_job=1,
                concurrency=1, batch_size=8)
    res = run_extract(staged, out, library=GOLDEN_PROFILES)  # one big group
    assert res["rows_written"] == len(golden_corpus())  # recomputed cleanly
    n = duckdb.sql(f"SELECT count(*) FROM '{out}/data/*/*.parquet'").fetchone()[0]
    assert n == len(golden_corpus())  # no stale duplicates from old layout


def test_bucketize_idempotent(staged_run, tmp_path):
    staged, _ = staged_run
    marker = os.path.join(staged, "_manifests", "_bucketize.json")
    mtime = os.path.getmtime(marker)
    bucketize(str(tmp_path / "src"), staged, num_buckets=4)  # same inputs
    assert os.path.getmtime(marker) == mtime  # skipped, not rewritten


def test_quarantine_rows_kept(ray_session):
    out = extract_dataset(_golden_pages_ds(), library=GOLDEN_PROFILES).to_pandas()
    statuses = out.set_index(out["url"].map(golden_key))["status"]
    assert statuses["pdf-broken"] == "failed_parse"
    assert statuses["empty"] == "failed_all_profiles"
    assert (statuses.drop(["pdf-broken", "empty"]) == "ok").all()


def test_oversized_rows_routed_and_extracted(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data

    from xhs_ocr_ray.pipelines.extract_pages import OVERSIZED_HTML
    from xhs_ocr_ray.sources.pages import PAGES_SCHEMA

    big_body = b"<article><p>" + b"big content word " * (OVERSIZED_HTML // 16) + b"</p></article>"
    assert len(big_body) >= OVERSIZED_HTML
    rows = pa.table(
        {
            "url": ["https://h.example.com/article/big", "https://h.example.com/article/small"],
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array([big_body, b"<article><p>tiny page text</p></article>"], pa.binary()),
            "text": ["", ""],
            "lang": ["en", "en"],
        },
        schema=PAGES_SCHEMA,
    )
    src, staged, out = str(tmp_path / "s"), str(tmp_path / "st"), str(tmp_path / "o")
    os.makedirs(src)
    ray.data.from_arrow(rows).write_parquet(src)
    bucketize(src, staged, num_buckets=4)
    # Oversized row landed in the dedicated bucket range (id >= 4).
    bucket_ids = sorted(
        int(os.path.basename(d).split("=")[1])
        for d in __import__("glob").glob(os.path.join(staged, "data", "bucket=*"))
    )
    assert any(b >= 4 for b in bucket_ids)
    res = run_extract(staged, out, concurrency=1, batch_size=8)
    assert res["rows_written"] == 2
    import duckdb

    df = duckdb.sql(f"SELECT url, status FROM '{out}/data/*/*.parquet' ORDER BY url").df()
    assert list(df["status"]) == ["ok", "ok"]


def test_recompute_is_byte_identical(staged_run):
    """Idempotency: recomputing an invalidated bucket reproduces the exact
    same output bytes (order-insensitive per url)."""
    import duckdb

    staged, out = staged_run
    run_extract(staged, out, library=GOLDEN_PROFILES, buckets_per_job=1,
                concurrency=1, batch_size=8)
    q = (
        f"SELECT md5(string_agg(url || '|' || coalesce(extracted_text, '') "
        f"|| '|' || status, chr(10) ORDER BY url)) FROM '{out}/data/*/*.parquet'"
    )
    digest1 = duckdb.sql(q).fetchone()[0]
    victim = sorted(
        p for p in os.listdir(os.path.join(out, "_manifests"))
        if p.startswith("group-")
    )[0]
    os.unlink(os.path.join(out, "_manifests", victim))
    run_extract(staged, out, library=GOLDEN_PROFILES, buckets_per_job=1,
                concurrency=1, batch_size=8)
    digest2 = duckdb.sql(q).fetchone()[0]
    assert digest1 == digest2


def test_flagship_metrics_pages_use_profile_fallback(ray_session):
    import json

    import pyarrow.parquet as pq
    import ray.data

    from xhs_ocr_ray.profiles import default_library
    from xhs_ocr_ray.sources.pages import pages_from_documents

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 60)
    pages = pages_from_documents(docs)
    out = extract_dataset(
        ray.data.from_arrow(pages), library=default_library(),
        concurrency=1, batch_size=32,
    ).to_pandas()
    metrics = out[out["url"].str.contains("/metrics/")]
    assert len(metrics) >= 1  # doc_id 13 and 42 in range
    assert (metrics["status"] == "ok").all()
    assert (metrics["profile_id"] == 2).all()  # fallback fired
    fields = json.loads(metrics.iloc[0]["fields"])
    assert set(fields) == {"views", "likes", "shares"}


def test_debug_artifacts_written(tmp_path, ray_session):
    """L15 analog: per-partition annotated text artifacts (numbered lines)."""
    import json as json_mod
    import os as os_mod

    from xhs_ocr_ray.stages.debug_sink import write_debug_artifacts

    out = write_debug_artifacts(
        extract_dataset(_golden_pages_ds(), library=GOLDEN_PROFILES),
        str(tmp_path / "debug"),
    )
    arts = []
    for f in os_mod.listdir(out):
        with open(os_mod.path.join(out, f)) as fh:
            arts += [json_mod.loads(line) for line in fh if line.strip()]
    by_key = {golden_key(a["url"]): a["artifact"] for a in arts}
    assert len(by_key) == len(golden_corpus())
    assert "status=ok" in by_key["boilerplate"]
    assert "   0| The Actual Headline" in by_key["boilerplate"]
    assert "status=failed_parse" in by_key["pdf-broken"]


def test_ingest_capture_dir_feeds_extraction(ray_session, tmp_path):
    """S6 analog: a raw HTML capture tree ingests into the canonical pages
    schema and flows through the real extraction pipeline."""
    import datetime

    from xhs_ocr_ray.pipelines.extract_pages import extract_dataset
    from xhs_ocr_ray.profiles import default_library
    from xhs_ocr_ray.sources.capture import ingest_capture_dir

    site = tmp_path / "cap" / "news.example.com"
    (site / "a").mkdir(parents=True)
    (site / "a" / "story.html").write_text(
        "<html><body><article><p>Hello capture world, this is the main "
        "story body with enough words to win scoring.</p></article>"
        "<div class='nav'>menu menu</div></body></html>")
    (site / "index.html").write_text(
        "<html><body><main><p>Front page body text, long enough to be "
        "selected as content.</p></main></body></html>")

    ds = ingest_capture_dir(
        str(tmp_path / "cap"),
        warc_ts=datetime.datetime(2024, 1, 7, tzinfo=datetime.timezone.utc))
    rows = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert rows.url.tolist() == [
        "https://news.example.com/", "https://news.example.com/a/story"]
    assert rows.warc_ts.dt.year.tolist() == [2024, 2024]
    assert all(h.startswith(b"<html>") for h in rows.html)

    out = (extract_dataset(ds, library=default_library(),
                           concurrency=(1, 2), batch_size=8)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert (out.status == "ok").all()
    assert "Hello capture world" in out.extracted_text[1]
    assert "menu" not in out.extracted_text[1]  # boilerplate pruned


def test_run_cli_warc_input_resumes(ray_session, tmp_path):
    """--input-format warc: WARC segments ingest once (fingerprinted),
    bucketize + extract run, and a re-run skips every group."""
    from xhs_ocr_ray.run import main
    from xhs_ocr_ray.sources.warc import encode_warc

    html = (b"<html><body><article><p>Warc ingestion body text long "
            b"enough to score as main content here.</p></article>"
            b"</body></html>")
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "seg0.warc.gz").write_bytes(encode_warc([
        (f"https://w.example/{i}", "2024-01-05T00:00:00Z", html)
        for i in range(20)
    ]))
    argv = ["--input", str(indir), "--input-format", "warc",
            "--staged", str(tmp_path / "staged"),
            "--out", str(tmp_path / "out"), "--num-buckets", "2",
            "--concurrency", "2"]
    assert main(argv) == 0
    import glob
    import pyarrow.parquet as pq

    files = glob.glob(str(tmp_path / "out" / "data" / "*" / "*.parquet"))
    assert sum(pq.read_metadata(f).num_rows for f in files) == 20
    assert main(argv) == 0  # resume: ingest + all groups skipped
