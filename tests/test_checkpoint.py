import json
import os

from xhs_ocr_ray.state import checkpoint as ckpt


def test_fingerprint_changes_with_content(tmp_path):
    f = tmp_path / "a.parquet"
    f.write_bytes(b"12345")
    fp1 = ckpt.input_fingerprint([str(f)])
    f.write_bytes(b"1234567")  # size change → new fingerprint
    fp2 = ckpt.input_fingerprint([str(f)])
    assert fp1 != fp2
    assert ckpt.input_fingerprint([str(f)]) == fp2  # stable


def test_fingerprint_order_insensitive(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.write_bytes(b"x")
    b.write_bytes(b"yy")
    assert ckpt.input_fingerprint([str(a), str(b)]) == ckpt.input_fingerprint(
        [str(b), str(a)]
    )


def test_fingerprint_missing_file(tmp_path):
    assert ckpt.input_fingerprint([str(tmp_path / "nope")])  # no raise


def test_commit_and_read_manifest(tmp_path):
    out = str(tmp_path)
    ckpt.commit_manifest(out, "7", {"fingerprint": "f", "status": "ok"})
    m = ckpt.read_manifest(out, "7")
    assert m["fingerprint"] == "f"
    assert m["shard_id"] == "7"
    assert ckpt.is_complete(out, "7", "f")
    assert not ckpt.is_complete(out, "7", "other")
    assert not ckpt.is_complete(out, "8", "f")


def test_corrupt_manifest_is_pending(tmp_path):
    out = str(tmp_path)
    os.makedirs(ckpt.manifest_dir(out))
    with open(ckpt.manifest_path(out, "3"), "w") as f:
        f.write("{not json")
    assert ckpt.read_manifest(out, "3") is None
    assert ckpt.pending_shards({"3": "fp"}, out) == ["3"]


def test_failed_status_is_pending(tmp_path):
    out = str(tmp_path)
    ckpt.commit_manifest(out, "2", {"fingerprint": "f", "status": "failed"})
    assert ckpt.pending_shards({"2": "f"}, out) == ["2"]


def test_atomic_output_dir_success_and_failure(tmp_path):
    final = str(tmp_path / "out")
    with ckpt.atomic_output_dir(final) as tmp:
        with open(os.path.join(tmp, "x"), "w") as f:
            f.write("data")
    assert os.path.exists(os.path.join(final, "x"))
    # failure → final dir untouched
    try:
        with ckpt.atomic_output_dir(final) as tmp:
            with open(os.path.join(tmp, "y"), "w") as f:
                f.write("new")
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert os.path.exists(os.path.join(final, "x"))
    assert not os.path.exists(os.path.join(final, "y"))


def test_manifest_commit_is_atomic_no_tmp_left(tmp_path):
    out = str(tmp_path)
    ckpt.commit_manifest(out, "5", {"fingerprint": "f", "status": "ok"})
    leftovers = [p for p in os.listdir(ckpt.manifest_dir(out)) if p.endswith(".tmp")]
    assert not leftovers
    with open(ckpt.manifest_path(out, "5")) as f:
        assert json.load(f)["status"] == "ok"
