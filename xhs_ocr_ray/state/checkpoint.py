"""Per-partition checkpoint manifests (SURVEY.md §4 "Checkpoint / resume").

The reference's resume story is window + idempotent upsert (whole-window
granularity). Here every url-hash bucket gets a JSON manifest committed
ATOMICALLY (tmp + rename) after its output parquet lands; a manifest records
the input fingerprint, so a re-run with unchanged inputs skips the bucket
entirely (no recompute — the north_rule bar), and a changed input
invalidates and recomputes just that bucket.

Ray Data has no transactional sink; this module is that missing piece.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import time


def input_fingerprint(paths: list[str]) -> str:
    """Stable fingerprint of a set of input files: sorted (path, size)."""
    h = hashlib.blake2b(digest_size=16)
    for p in sorted(paths):
        try:
            size = os.stat(p).st_size
        except OSError:
            size = -1
        h.update(p.encode())
        h.update(str(size).encode())
    return h.hexdigest()


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def manifest_path(out_dir: str, shard_id: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"{shard_id}.json")


def read_manifest(out_dir: str, shard_id: str) -> dict | None:
    try:
        with open(manifest_path(out_dir, shard_id)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def commit_manifest(out_dir: str, shard_id: str, payload: dict) -> None:
    """Atomic: write to a temp file in the manifest dir, then rename."""
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    payload = dict(payload, shard_id=shard_id, committed_at=time.time())
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, sort_keys=True)
            f.write("\n")
        os.rename(tmp, manifest_path(out_dir, shard_id))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def is_complete(out_dir: str, shard_id: str, fingerprint: str) -> bool:
    m = read_manifest(out_dir, shard_id)
    return bool(m) and m.get("fingerprint") == fingerprint and m.get("status") == "ok"


def pending_shards(shards: dict[str, str], out_dir: str) -> list[str]:
    """Shard ids whose manifest is missing or fingerprint-stale."""
    return [sid for sid, fp in shards.items() if not is_complete(out_dir, sid, fp)]


def atomic_output_dir(final_dir: str):
    """Context manager: yield a temp dir; on success swap it into place."""

    class _Ctx:
        def __enter__(self):
            parent = os.path.dirname(os.path.normpath(final_dir))
            os.makedirs(parent, exist_ok=True)
            self.tmp = tempfile.mkdtemp(prefix=".staging.", dir=parent)
            return self.tmp

        def __exit__(self, exc_type, exc, tb):
            if exc_type is None:
                if os.path.isdir(final_dir):
                    shutil.rmtree(final_dir)
                os.rename(self.tmp, final_dir)
            else:
                shutil.rmtree(self.tmp, ignore_errors=True)
            return False

    return _Ctx()


def gc_expired(out_dir: str, *, keep_after: float) -> list[str]:
    """Manifest-driven retention purge (the reference's 2-day directory purge,
    social_ocr.py:31-53, recast): remove group output dirs + manifests whose
    commit time predates ``keep_after`` (unix seconds). Returns removed ids."""
    removed: list[str] = []
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return removed
    for name in sorted(os.listdir(mdir)):
        if not name.startswith("group-") or not name.endswith(".json"):
            continue
        sid = name[: -len(".json")]
        m = read_manifest(out_dir, sid)
        if m and m.get("committed_at", 0) < keep_after:
            gid = sid[len("group-"):]
            for sub in ("data", "lineage"):
                shutil.rmtree(os.path.join(out_dir, sub, f"group={gid}"),
                              ignore_errors=True)
            os.unlink(manifest_path(out_dir, sid))
            removed.append(gid)
    return removed
