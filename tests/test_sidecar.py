import json

from xhs_ocr_ray.functions.mapping import apply_column_mapping
from xhs_ocr_ray.sources.sidecar import join_sidecar, read_sidecar


def test_read_and_join_sidecar(tmp_path, ray_session):
    import ray.data

    sidecars = [
        {"url": "https://h/a/1", "title": "T1", "account_id": "acc1",
         "device_ip": "10.0.0.1", "collect_date": "2024-01-01"},
        {"url": "https://h/a/2", "title": "T2", "account_id": "acc2",
         "device_ip": "10.0.0.2", "collect_date": "2024-01-02"},
    ]
    p = tmp_path / "sidecar.jsonl"
    p.write_text("\n".join(json.dumps(s) for s in sidecars))
    side = read_sidecar(str(p))
    pages = ray.data.from_items(
        [
            {"url": "https://h/a/1", "n": 1},
            {"url": "https://h/a/2", "n": 2},
            {"url": "https://h/a/3", "n": 3},  # no sidecar → kept, padded
        ]
    )
    out = join_sidecar(pages, side).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == 3
    assert out.loc[0, "title"] == "T1"
    assert out.loc[1, "account_id"] == "acc2"
    assert out.loc[2, "title"] == ""  # padded


def test_apply_column_mapping(ray_session):
    import ray.data

    ds = ray.data.from_items([{"作品标题": "x", "链接": "u", "other": 1}])
    out = apply_column_mapping(ds, {"作品标题": "title", "链接": "url", "缺失": "gone"})
    assert set(out.schema().names) == {"title", "url", "other"}


def test_debug_sink(tmp_path, ray_session):
    import glob

    import ray.data

    from xhs_ocr_ray.stages.debug_sink import write_debug_artifacts

    ds = ray.data.from_items(
        [
            {"url": "u1", "extracted_text": "line a\nline b\n", "status": "ok",
             "profile_id": 0},
            {"url": "u2", "extracted_text": None, "status": "failed_all_profiles",
             "profile_id": -1},
        ]
    )
    out_dir = str(tmp_path / "debug")
    write_debug_artifacts(ds, out_dir)
    files = glob.glob(out_dir + "/*.json")
    assert files
    content = "".join(open(f).read() for f in files)
    assert "u1" in content and "line a" in content and "failed_all_profiles" in content


def test_profile_pairing():
    from xhs_ocr_ray.profiles import Profile, extract_with_profiles

    html = (
        b"<div class='metrics-panel'><div>views</div><div>1024</div>"
        b"<div>likes</div><div>55</div></div>"
    )
    prof = Profile(doc_class="traffic", profile_id=1,
                   keep_selectors=("div.metrics-panel",), pair_fields=4)
    res = extract_with_profiles(html, [prof])
    assert res.status == "ok"
    assert res.text == "views:1024|likes:55\n"
    # wrong cardinality → quarantined
    bad = Profile(doc_class="traffic", profile_id=1,
                  keep_selectors=("div.metrics-panel",), pair_fields=6)
    res2 = extract_with_profiles(html, [bad])
    assert res2.status == "failed_all_profiles"
