"""Typed per-format sidecar readers (SURVEY.md §2.1 S4 variants).

The reference has three distinct user-info sidecar shapes, each read inline
during the directory walk (core/run.py:208-341):

- tiktok ``user_info.json``: ``share_link → profile_url``, ``nickname``,
  ``follow_count → follows``, ``follower_count → fans``,
  ``like_count → interaction`` (run.py:208-238);
- weibo ``user_info.json``: same mapping WITHOUT interaction (weibo has no
  like-count; run.py:281-308);
- xhs ``profile_url.json``: ``user_profile_url → profile_url``; the three
  counts arrive as Chinese-formatted strings ("1.5万") and pass through the
  Chinese-number scalar (run.py:310-341, M10 analog
  :func:`xhs_ocr_ray.functions.normalize.parse_cn_number`).

Path metadata (run.py:199-207): the record's parent directory is
``<device_ip>#<account_id>`` (no ``#`` → empty account), its parent is the
collect date. The reference drops records whose nickname is empty
(run.py:225-231); here they are KEPT with ``status='invalid'`` — the repo's
row-level lineage convention.

Ray-Data-first shape: sidecars arrive as one Dataset of
``(app, path, payload-json)`` rows (e.g. from ``read_json`` over a crawl
manifest); :func:`typed_user_info` is a vectorized ``map_batches`` transform
emitting one typed row per record. Missing counts normalize to -1 (never
null: nullable int columns degrade to float in pandas interchange).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from xhs_ocr_ray.functions.normalize import parse_cn_number

USER_INFO_SCHEMA = pa.schema(
    [
        ("app", pa.string()),
        ("device_ip", pa.string()),
        ("account_id", pa.string()),
        ("collect_date", pa.string()),
        ("nickname", pa.string()),
        ("follows", pa.int64()),
        ("fans", pa.int64()),
        ("interaction", pa.int64()),
        ("profile_url", pa.string()),
        ("status", pa.string()),
    ]
)

# filename each app's user-info record lives in (anything else is not a
# user-info sidecar for that app and is skipped)
USER_INFO_FILENAME = {
    "tiktok": "user_info.json",
    "weibo": "user_info.json",
    "xhs": "profile_url.json",
}

MISSING = -1


def parse_path_meta(path: str) -> tuple[str, str, str]:
    """``…/<date>/<ip>#<account>/<file>`` → (device_ip, account_id, date)."""
    parent = os.path.basename(os.path.dirname(path))
    date = os.path.basename(os.path.dirname(os.path.dirname(path)))
    if "#" in parent:
        ip, account = parent.split("#", 1)
    else:
        ip, account = parent, ""
    return ip, account, date


def _count(value, *, cn: bool) -> int:
    """Normalize a count field: ints pass through; strings parse (optionally
    via the Chinese-number scalar); absent/unparseable → MISSING."""
    from xhs_ocr_ray.functions.normalize import _CN_UNITS

    if value is None or value == "":
        return MISSING
    if isinstance(value, (int, float)):
        return int(value)
    s = str(value).strip()
    if cn:
        # distinguish garbage from a real zero: parse_cn_number maps
        # unparseable strings to 0.0, which must become MISSING here
        core = s[:-1] if s and s[-1] in _CN_UNITS else s
        try:
            float(core)
        except ValueError:
            return MISSING
        return int(parse_cn_number(s))
    try:
        return int(float(s))
    except ValueError:
        return MISSING


def parse_user_info(app: str, path: str, payload: str | dict) -> dict | None:
    """One typed record, or ``None`` when the file is not this app's
    user-info sidecar or the payload is not a JSON object."""
    if os.path.basename(path) != USER_INFO_FILENAME.get(app):
        return None
    if isinstance(payload, str):
        try:
            payload = json.loads(payload)
        except ValueError:
            payload = None
    if not isinstance(payload, dict):
        return None
    ip, account, date = parse_path_meta(path)
    if app == "xhs":
        rec = {
            "nickname": str(payload.get("nickname", "") or ""),
            "follows": _count(payload.get("following_count"), cn=True),
            "fans": _count(payload.get("fans"), cn=True),
            "interaction": _count(payload.get("likes_collect_count"), cn=True),
            "profile_url": str(payload.get("user_profile_url", "") or ""),
        }
    else:
        rec = {
            "nickname": str(payload.get("nickname", "") or ""),
            "follows": _count(payload.get("follow_count"), cn=False),
            "fans": _count(payload.get("follower_count"), cn=False),
            "interaction": (
                _count(payload.get("like_count"), cn=False)
                if app == "tiktok" else MISSING  # weibo has no like count
            ),
            "profile_url": str(payload.get("share_link", "") or ""),
        }
    rec.update(
        app=app, device_ip=ip, account_id=account, collect_date=date,
        status="ok" if rec["nickname"] else "invalid",
    )
    return rec


POST_DATA_FILENAME = {"tiktok": "post_data.json", "weibo": "weibo_data.json"}

POST_DATA_SCHEMA = pa.schema(
    [
        ("app", pa.string()),
        ("device_ip", pa.string()),
        ("account_id", pa.string()),
        ("collect_time", pa.string()),
        ("post_json", pa.string()),  # the post dict, metadata appended
    ]
)


def typed_post_data(ds, *, app_col: str = "app", path_col: str = "path",
                    payload_col: str = "payload"):
    """Post-data list sidecars (tiktok ``post_data.json`` / weibo
    ``weibo_data.json``, core/run.py:240-276): each file is a JSON LIST of
    post dicts; every post gets ``device_ip`` and ``collect_time`` from the
    path appended (the reference mutates the dicts in place before sync).
    One output row per post, the enriched dict passed through as JSON —
    the reference's downstream schema is config-declared, not fixed here."""

    def explode_batch(batch: pa.Table) -> pa.Table:
        recs: list[dict] = []
        for app, path, payload in zip(batch.column(app_col).to_pylist(),
                                      batch.column(path_col).to_pylist(),
                                      batch.column(payload_col).to_pylist()):
            if os.path.basename(path) != POST_DATA_FILENAME.get(app):
                continue
            if isinstance(payload, str):
                try:
                    payload = json.loads(payload)
                except ValueError:
                    continue
            if not isinstance(payload, list):
                continue
            ip, account, date = parse_path_meta(path)
            for post in payload:
                if not isinstance(post, dict):
                    continue
                post = {**post, "device_ip": ip, "collect_time": date}
                recs.append(
                    {"app": app, "device_ip": ip, "account_id": account,
                     "collect_time": date,
                     "post_json": json.dumps(post, ensure_ascii=False,
                                             sort_keys=True)}
                )
        return pa.Table.from_pylist(recs, schema=POST_DATA_SCHEMA)

    return ds.map_batches(explode_batch, batch_format="pyarrow")


def typed_user_info(ds, *, app_col: str = "app", path_col: str = "path",
                    payload_col: str = "payload"):
    """``map_batches`` transform: (app, path, payload) rows → typed user-info
    records (USER_INFO_SCHEMA). Non-matching files are dropped row-local."""

    def parse_batch(batch: pa.Table) -> pa.Table:
        apps = batch.column(app_col).to_pylist()
        paths = batch.column(path_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        recs = [
            r for r in (
                parse_user_info(a, p, pl)
                for a, p, pl in zip(apps, paths, payloads)
            )
            if r is not None
        ]
        return pa.Table.from_pylist(recs, schema=USER_INFO_SCHEMA)

    return ds.map_batches(parse_batch, batch_format="pyarrow")
