"""Declarative on-disk profile config (reference: config.ini [tags]/[fields]
parsed at core/run.py:434-438 and db/data_sync.py:15-19 — the extraction
schema is data, not code)."""

import json

import pytest

from xhs_ocr_ray.profiles import (
    Profile,
    ProfileLibrary,
    default_library,
    load_field_mapping,
)

INI = """\
[profile:metrics:1]
keep_selectors = div.metrics-panel
field.views = ^views (\\d+)$
field.likes = ^likes (\\d+)$
field.shares = ^shares (\\d+)$
field.comments = ^comments (\\d+)$

[profile:metrics:2]
keep_selectors = div.metrics-panel
field.views = ^views (\\d+)$
field.likes = ^likes (\\d+)$
field.shares = ^shares (\\d+)$

[profile:article:1]
normalize = true
pair_fields = 2
layout_parser = single_line

[fields]
作品标题 = title
链接 = url
"""


def test_default_library_roundtrips_through_json(tmp_path):
    path = str(tmp_path / "profiles.json")
    lib = default_library()
    lib.to_config(path)
    got = ProfileLibrary.from_config(path)
    assert got.profiles == lib.profiles  # frozen dataclasses compare by value
    # the on-disk form is plain JSON a user can edit
    obj = json.load(open(path, encoding="utf-8"))
    assert [p["profile_id"] for p in obj["profiles"]] == [1, 2]
    assert list(obj["profiles"][0]["fields"]) == [
        "views", "likes", "shares", "comments"]


def test_ini_config_parses_ordered_fields_and_toggles(tmp_path):
    path = str(tmp_path / "profiles.ini")
    path_obj = tmp_path / "profiles.ini"
    path_obj.write_text(INI, encoding="utf-8")
    lib = ProfileLibrary.from_config(path)
    m1, m2 = lib.for_class("metrics")
    assert m1 == default_library().for_class("metrics")[0]
    assert m2 == default_library().for_class("metrics")[1]
    (art,) = lib.for_class("article")
    assert art == Profile(doc_class="article", profile_id=1, normalize=True,
                          pair_fields=2, layout_parser="single_line")
    # [fields] section is the CN→EN column mapping, not a profile
    assert load_field_mapping(path) == {"作品标题": "title", "链接": "url"}


def test_field_mapping_from_json(tmp_path):
    path = str(tmp_path / "cfg.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"profiles": [], "field_mapping": {"设备IP": "device_ip"}}, f)
    assert load_field_mapping(path) == {"设备IP": "device_ip"}


def test_bad_ini_sections_raise(tmp_path):
    bad = tmp_path / "bad.ini"
    bad.write_text("[profile:broken]\nx = y\n", encoding="utf-8")
    with pytest.raises(ValueError, match="profile:<doc_class>:<profile_id>"):
        ProfileLibrary.from_config(str(bad))
    empty = tmp_path / "empty.ini"
    empty.write_text("[other]\nx = y\n", encoding="utf-8")
    with pytest.raises(ValueError, match="no \\[profile"):
        ProfileLibrary.from_config(str(empty))


def test_flagship_runs_from_config_file(tmp_path, ray_session):
    """The metrics fallback pipeline behaves identically when its library
    is loaded from a config file instead of built in code."""
    import pyarrow.parquet as pq
    import ray.data

    from xhs_ocr_ray.pipelines.extract_pages import extract_dataset
    from xhs_ocr_ray.sources.pages import pages_from_documents

    path = str(tmp_path / "profiles.json")
    default_library().to_config(path)
    lib = ProfileLibrary.from_config(path)

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 60)
    pages = pages_from_documents(docs)
    out = extract_dataset(
        ray.data.from_arrow(pages), library=lib, concurrency=1, batch_size=32,
    ).to_pandas()
    metrics = out[out["url"].str.contains("/metrics/")]
    assert len(metrics) >= 1
    assert (metrics["status"] == "ok").all()
    assert (metrics["profile_id"] == 2).all()  # fallback fired from config
    fields = json.loads(metrics.iloc[0]["fields"])
    assert set(fields) == {"views", "likes", "shares"}
