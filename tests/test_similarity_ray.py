import numpy as np
import pytest

from xhs_ocr_ray.stages.multimodal import FrameSample, ImageDecode, synth_media_table
from xhs_ocr_ray.stages.similarity import LshIndexSearch, brute_force_topk


def _emb_ds(n=64, dim=16, seed=3):
    import ray.data

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    ), vecs


def test_brute_force_topk_matches_numpy(ray_session):
    ds, vecs = _emb_ds()
    q = vecs[0]
    top = brute_force_topk(ds, q, k=5)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = np.argsort(-(unit @ (q / np.linalg.norm(q))))[:5].tolist()
    assert top.column("vec_id").to_pylist() == want
    sims = top.column("sim").to_pylist()
    assert sims == sorted(sims, reverse=True)


def test_lsh_index_recall(ray_session):
    ds, vecs = _emb_ds(n=128)
    idx = LshIndexSearch(ds, num_planes=6, probe_hamming=2)
    hits = 0
    for qi in range(8):
        got = [i for i, _ in idx.search(vecs[qi], k=5)]
        assert qi in got  # the vector itself must always be found
        unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        exact = set(np.argsort(-(unit @ unit[qi]))[:5].tolist())
        hits += len(set(got) & exact)
    assert hits / (8 * 5) > 0.5  # multi-probe recall over half


def test_image_decode_stub_raises_without_fake():
    dec = ImageDecode()
    with pytest.raises(NotImplementedError):
        dec._decode(b"payload", 8, 8)


def test_image_decode_fake_deterministic(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synth_media_table(12))
    out = (
        ds.map_batches(ImageDecode, fn_constructor_kwargs={"fake": True},
                       batch_format="pyarrow", batch_size=4, concurrency=(1, 2))
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(out) == 12
    assert all(len(f) == 64 for f in out["feature"])
    out2 = (
        ray.data.from_arrow(synth_media_table(12))
        .map_batches(ImageDecode, fn_constructor_kwargs={"fake": True},
                     batch_format="pyarrow", batch_size=4, concurrency=(1, 2))
        .to_pandas()
        .sort_values("media_id")
    )
    assert np.allclose(np.stack(out["feature"].map(np.asarray)),
                       np.stack(out2["feature"].map(np.asarray)))


def test_frame_sample_fanout(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synth_media_table(6))
    out = ds.map_batches(
        FrameSample, fn_constructor_kwargs={"fake": True, "n_frames": 3},
        batch_format="pyarrow", batch_size=4, concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 18  # 6 media × 3 frames
    assert set(out.columns) == {"media_id", "frame_ms", "feature"}


def test_ivf_index_recall(ray_session):
    from xhs_ocr_ray.stages.similarity import IvfIndexSearch

    ds, vecs = _emb_ds(n=256)
    idx = IvfIndexSearch(ds, n_centroids=8, nprobe=3)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    hits = 0
    for qi in range(8):
        got = [i for i, _ in idx.search(vecs[qi], k=5)]
        assert qi in got
        exact = set(np.argsort(-(unit @ unit[qi]))[:5].tolist())
        hits += len(set(got) & exact)
    assert hits / 40 > 0.5


def test_ivf_training_sample_unbiased_on_sorted_corpus(ray_session):
    """The IVF training sample must be drawn uniformly by id-hash, not
    first-N: on a corpus SORTED so all of cluster A precedes cluster B, a
    head sample never sees B and the trained centroids collapse onto A.
    The hash sample must span both clusters, and so must the centroids."""
    import ray.data

    from xhs_ocr_ray.stages.similarity import (IvfIndexSearch,
                                               _uniform_sample_matrix)

    rng = np.random.default_rng(7)
    dim, half = 8, 128
    a_center = np.zeros(dim); a_center[0] = 10.0
    b_center = np.zeros(dim); b_center[1] = 10.0
    a = a_center + 0.1 * rng.standard_normal((half, dim))
    b = b_center + 0.1 * rng.standard_normal((half, dim))
    vecs = np.concatenate([a, b]).astype(np.float32)  # sorted: A then B
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()}
         for i in range(2 * half)],
        override_num_blocks=4,
    )

    sample = _uniform_sample_matrix(ds, vec_col="embedding",
                                    id_col="vec_id", sample=32)
    unit = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    ua = a_center / np.linalg.norm(a_center)
    ub = b_center / np.linalg.norm(b_center)
    n_a = int(((unit @ ua) > 0.9).sum())
    n_b = int(((unit @ ub) > 0.9).sum())
    assert n_a + n_b == 32  # every sampled vector sits in one cluster
    assert n_a >= 4 and n_b >= 4  # head sampling would give n_b == 0

    # end to end: trained centroids cover both clusters (first-N training
    # with sample <= half would leave max cosine-to-B near cos(A,B) = 0)
    idx = IvfIndexSearch(ds, n_centroids=4, nprobe=2, sample=32)
    cents = idx.centroids
    assert (cents @ ua).max() > 0.9 and (cents @ ub).max() > 0.9
    got = [i for i, _ in idx.search(vecs[half + 3], k=5)]
    assert half + 3 in got


def test_audio_chunk_windows(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.multimodal import AudioChunk, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(6))  # 4 video-ish rows w/ dur
    out = ds.map_batches(
        AudioChunk, fn_constructor_kwargs={"fake": True, "chunk_ms": 1000},
        batch_format="pyarrow", batch_size=4, concurrency=(1, 2),
    ).to_pandas()
    # dur=0 rows still get one chunk; dur=4000+i*100 rows get ceil(dur/1000)
    per = out.groupby("media_id").size()
    assert per[1] == 1 and per[2] == 1  # duration 0
    assert per[0] == 4  # 4000 ms
    assert per[3] == 5  # 4300 ms → ceil = 5
    assert (out[out.media_id == 0]["chunk_start_ms"].tolist()
            == [0, 1000, 2000, 3000])
    assert all(len(f) == 13 for f in out["feature"])

    dec = AudioChunk()
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        dec(synth_media_table(2))


def test_similarity_join(ray_session):
    import numpy as np
    import pytest
    import ray.data

    from xhs_ocr_ray.stages.similarity import similarity_join

    right = ray.data.from_items([
        {"vec_id": 0, "embedding": [1.0, 0.0]},
        {"vec_id": 2, "embedding": [0.0, 1.0]},
        {"vec_id": 4, "embedding": [1.0, 0.0]},   # duplicate direction of 0
    ], override_num_blocks=1)
    left = ray.data.from_items([
        {"vec_id": 1, "embedding": [0.9, 0.1]},   # → 0 (tie 0 vs 4 → min id)
        {"vec_id": 3, "embedding": [0.1, 0.9]},   # → 2
        {"vec_id": 5, "embedding": [0.0, 0.0]},   # zero vector: sims all 0,
                                                   # argmax-first → id 0
    ], override_num_blocks=2)
    out = (similarity_join(left, right).to_pandas()
           .set_index("vec_id").sort_index())
    assert out.nn_id.tolist() == [0, 2, 0]

    with pytest.raises(ValueError, match="max_right"):
        similarity_join(left, right, max_right=2)
    with pytest.raises(ValueError, match="empty"):
        similarity_join(left, right.filter(lambda r: False))


def test_lsh_similarity_join_exhaustive_equals_brute(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from xhs_ocr_ray.stages.similarity import (
        LshIndexSearch,
        lsh_similarity_join,
        similarity_join,
    )

    rng = np.random.default_rng(7)
    corpus = [{"vec_id": i, "embedding": rng.standard_normal(8).tolist()}
              for i in range(0, 60, 2)]
    queries = [{"vec_id": i, "embedding": rng.standard_normal(8).tolist()}
               for i in range(1, 41, 2)]
    right = ray.data.from_items(corpus, override_num_blocks=2)
    left = ray.data.from_items(queries, override_num_blocks=3)

    idx = LshIndexSearch(right, num_planes=4,
                         index_dir=str(tmp_path / "lsh"))
    # exhaustive probes == brute force
    got = (lsh_similarity_join(left, idx, probe_hamming=4)
           .to_pandas().set_index("qid").sort_index())
    want = (similarity_join(left, right).to_pandas()
            .set_index("vec_id").sort_index())
    assert got.nn_id.tolist() == want.nn_id.tolist()
    # limited probes: a subset of queries may miss, but every answer
    # returned must be a real corpus id
    part = lsh_similarity_join(left, idx, probe_hamming=0).to_pandas()
    corpus_ids = {c["vec_id"] for c in corpus}
    assert set(part.nn_id).issubset(corpus_ids)
    assert len(part) <= len(queries)


def test_ivf_similarity_join_exhaustive_equals_brute(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from xhs_ocr_ray.stages.similarity import (
        IvfIndexSearch,
        ivf_similarity_join,
        similarity_join,
    )

    rng = np.random.default_rng(11)
    corpus = [{"vec_id": i, "embedding": rng.standard_normal(8).tolist()}
              for i in range(0, 60, 2)]
    queries = [{"vec_id": i, "embedding": rng.standard_normal(8).tolist()}
               for i in range(1, 41, 2)]
    right = ray.data.from_items(corpus, override_num_blocks=2)
    left = ray.data.from_items(queries, override_num_blocks=3)

    idx = IvfIndexSearch(right, n_centroids=4,
                         index_dir=str(tmp_path / "ivf"))
    # nprobe == n_centroids probes every cell == brute force
    got = (ivf_similarity_join(left, idx, nprobe=4)
           .to_pandas().set_index("qid").sort_index())
    want = (similarity_join(left, right).to_pandas()
            .set_index("vec_id").sort_index())
    assert got.nn_id.tolist() == want.nn_id.tolist()
    # nprobe=1 reads only each query's own cell: answers must be real
    # corpus ids, every query still answered (no cell is empty here)
    part = (ivf_similarity_join(left, idx, nprobe=1)
            .to_pandas().set_index("qid").sort_index())
    corpus_ids = {c["vec_id"] for c in corpus}
    assert set(part.nn_id).issubset(corpus_ids)
    assert len(part) <= len(queries)
