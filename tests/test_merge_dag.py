import time

import pytest

from xhs_ocr_ray.pipelines.merge_dag import run_merge_dag
from xhs_ocr_ray.stages.merge import MissingTableError
from xhs_ocr_ray.state import checkpoint as ckpt

KEY = ["account_id", "device_ip", "collect_date", "url"]


def _table(rows):
    import ray.data

    return ray.data.from_items(rows)


def _row(url, **extra):
    base = {"account_id": "a1", "device_ip": "10.0.0.1",
            "collect_date": "2024-01-01", "url": url}
    base.update({k: str(v) for k, v in extra.items()})
    return base


def test_reference_dag_end_to_end(ray_session):
    tables = {
        "video_top": _table([_row("v1", views="10")]),
        "video_bottom": _table([_row("v1", likes="5")]),
        "note_top": _table([_row("n1", views="7", likes="")]),
        "note_bottom": _table([_row("n1", likes="3")]),
        "note_traffic": _table([_row("n1", clicks="11")]),
        "video_traffic": _table([_row("v1", clicks="22")]),
    }
    out = run_merge_dag(tables)
    ot = out["overview_traffic"].to_pandas().sort_values("url").reset_index(drop=True)
    assert len(ot) == 2
    n1 = ot[ot["url"] == "n1"].iloc[0]
    assert n1["views"] == "7" and n1["likes"] == "3" and n1["clicks"] == "11"
    v1 = ot[ot["url"] == "v1"].iloc[0]
    assert v1["views"] == "10" and v1["likes"] == "5" and v1["clicks"] == "22"


def test_related_step_aborts_on_missing(ray_session):
    tables = {"video_top": _table([_row("v1", views="1")])}  # bottom absent
    with pytest.raises(MissingTableError):
        run_merge_dag(tables)


def test_unrelated_step_tolerates_missing(ray_session):
    tables = {
        "video_top": _table([_row("v1", views="10")]),
        "video_bottom": _table([_row("v1", likes="5")]),
        "note_top": _table([_row("n1", views="7")]),
        "note_bottom": _table([_row("n1", likes="3")]),
        # note_traffic and video_traffic absent → step 3 output empty-ish
        "video_traffic": _table([_row("v1", clicks="22")]),
    }
    out = run_merge_dag(tables)
    ta = out["traffic_analysis"].to_pandas()
    assert len(ta) == 1  # only the present traffic table contributed


def test_gc_expired(tmp_path):
    out = str(tmp_path)
    ckpt.commit_manifest(out, "group-0-3", {"fingerprint": "f", "status": "ok"})
    import os

    os.makedirs(os.path.join(out, "data", "group=0-3"))
    removed = ckpt.gc_expired(out, keep_after=time.time() + 10)
    assert removed == ["0-3"]
    assert not os.path.exists(os.path.join(out, "data", "group=0-3"))
    assert ckpt.read_manifest(out, "group-0-3") is None
    # fresh manifests survive
    ckpt.commit_manifest(out, "group-4-7", {"fingerprint": "f", "status": "ok"})
    assert ckpt.gc_expired(out, keep_after=time.time() - 3600) == []
