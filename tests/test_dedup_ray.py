"""Near-dup family: MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine."""

import numpy as np

from xhs_ocr_ray.stages.dedup import (
    embedding_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and every good boy deserves fudge today"
)


def _docs():
    import ray.data

    near = BASE.replace("fudge", "cake")  # tiny edit → near-dup of BASE
    other = (
        "completely different content about distributed dataflow engines "
        "processing arrow batches with streaming backpressure semantics"
    )
    return ray.data.from_items(
        [
            {"doc_id": 1, "text": BASE, "lang": "en", "source": "s"},
            {"doc_id": 2, "text": near, "lang": "en", "source": "s"},
            {"doc_id": 3, "text": other, "lang": "en", "source": "s"},
            {"doc_id": 4, "text": BASE, "lang": "en", "source": "s"},  # exact dup
        ]
    )


def test_minhash_lsh_clusters_near_dups(ray_session):
    # broadcast_sigs default → small-side broadcast verify; 0 forces the
    # distributed attach-shuffle path. Both must produce identical clusters.
    for thresh in (200_000, 0):
        out = minhash_lsh_dedup(_docs(), "text", "doc_id", threshold=0.6,
                                broadcast_sigs=thresh)
        m = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
        assert m[1] == m[2] == m[4] == 1, f"broadcast_sigs={thresh}"
        assert m[3] == 3, f"broadcast_sigs={thresh}"


def test_simhash_clusters_near_dups(ray_session):
    out = simhash_dedup(_docs(), "text", "doc_id", max_hamming=3)
    m = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert m[1] == m[4] == 1  # exact dup always hamming 0
    assert m[3] == 3


def test_ngram_jaccard_pairs(ray_session):
    pairs = ngram_jaccard_pairs(
        _docs(), "text", "doc_id", ["lang", "source"], n=3, threshold=0.5
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (1, 4) in got  # identical docs → jaccard 1.0
    assert (1, 2) in got  # one-word edit → high jaccard
    assert not any(3 in p for p in got)


def test_components_match_union_find(ray_session):
    """Distributed min-label propagation == driver union-find, including
    multi-hop chains (several propagation rounds) and singletons."""
    import ray.data

    from xhs_ocr_ray.stages.components import assign_clusters, connected_components
    from xhs_ocr_ray.stages.dedup import _union_find

    rng = np.random.default_rng(42)
    n = 300
    edges = [
        (int(a), int(b)) for a, b in rng.integers(0, n, size=(150, 2)) if a != b
    ]
    edges += [(i, i + 1) for i in range(200, 212)]  # a 13-node chain
    pairs_ds = ray.data.from_items(
        [{"a": min(a, b), "b": max(a, b)} for a, b in edges]
    )
    ids_ds = ray.data.from_items([{"id": i} for i in range(n)])
    ref = _union_find([(a, b, 0.0) for a, b in edges])
    want = {i: ref.get(i, i) for i in range(n)}
    # distributed label propagation (driver_threshold=0 forces it) and the
    # bounded driver fast path must agree exactly
    for thresh in (0, 10**6):
        labels = connected_components(pairs_ds, driver_threshold=thresh)
        got = {
            r["id"]: r["cluster_id"]
            for r in assign_clusters(ids_ds, "id", labels).take_all()
        }
        assert got == want, f"driver_threshold={thresh}"


def test_components_parquet_spill(ray_session, tmp_path):
    """spill_threshold_rows=0 forces per-round parquet state; labels must be
    identical to the materialized path, the auto-created /tmp spill dir is
    reclaimed, and a caller-provided dir is left caller-owned."""
    import glob
    import ray.data

    from xhs_ocr_ray.stages.components import assign_clusters, connected_components

    edges = [(i, i + 1) for i in range(0, 40, 2)]  # 20 disjoint 2-cliques
    edges += [(100 + i, 101 + i) for i in range(9)]  # one 10-node chain
    pairs_ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
    ids = sorted({x for e in edges for x in e})
    ids_ds = ray.data.from_items([{"id": i} for i in ids])

    want_labels = connected_components(pairs_ds, driver_threshold=0)
    want = {
        r["id"]: r["cluster_id"]
        for r in assign_clusters(ids_ds, "id", want_labels).take_all()
    }

    # auto-created spill dir: identical labels, dir reclaimed before return
    before = set(glob.glob("/tmp/xhs_cc_spill/*"))
    labels = connected_components(
        pairs_ds, driver_threshold=0, spill_threshold_rows=0
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in assign_clusters(ids_ds, "id", labels).take_all()
    }
    assert got == want
    assert set(glob.glob("/tmp/xhs_cc_spill/*")) == before

    # caller-provided dir: identical labels, parquet state left in place
    sd = str(tmp_path / "cc_spill")
    labels2 = connected_components(
        pairs_ds, driver_threshold=0, spill_threshold_rows=0, spill_dir=sd
    )
    got2 = {
        r["id"]: r["cluster_id"]
        for r in assign_clusters(ids_ds, "id", labels2).take_all()
    }
    assert got2 == want
    assert glob.glob(sd + "/edges/*.parquet")


def test_components_empty_edges(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.components import assign_clusters, connected_components

    empty = ray.data.from_items([{"a": 1, "b": 2}]).filter(lambda r: False)
    labels = connected_components(empty)
    ids_ds = ray.data.from_items([{"id": i} for i in range(5)])
    got = {
        r["id"]: r["cluster_id"]
        for r in assign_clusters(ids_ds, "id", labels).take_all()
    }
    assert got == {i: i for i in range(5)}


def test_embedding_dedup(ray_session):
    import ray.data

    rng = np.random.default_rng(0)
    v = rng.standard_normal(16).astype(np.float32)
    near = v + rng.standard_normal(16).astype(np.float32) * 0.01
    far = rng.standard_normal(16).astype(np.float32)
    ds = ray.data.from_items(
        [
            {"vec_id": 1, "embedding": v.tolist()},
            {"vec_id": 2, "embedding": near.tolist()},
            {"vec_id": 3, "embedding": far.tolist()},
        ]
    )
    out = embedding_dedup(ds, "embedding", "vec_id", threshold=0.95)
    m = {r["vec_id"]: r["cluster_id"] for r in out.take_all()}
    assert m[1] == m[2] == 1
    assert m[3] == 3


def test_embedding_dedup_multi_table_recall(ray_session):
    """OR-ing hyperplane tables only ever ADDS candidate pairs: every pair
    clustered by the single table stays clustered, and a near-dup pair that
    the single table's bucketing misses is recovered by the extra tables."""
    import ray.data

    rng = np.random.default_rng(5)
    dim, thr = 16, 0.93
    base = rng.standard_normal((40, dim)).astype(np.float32)
    items = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # append near-dup partners (ids 100+i) for the first 20 vectors
    for i in range(20):
        near = base[i] + rng.standard_normal(dim).astype(np.float32) * 0.12
        items.append({"vec_id": 100 + i, "embedding": near.tolist()})

    def clusters(num_tables):
        ds = ray.data.from_items(items)
        out = embedding_dedup(ds, "embedding", "vec_id", threshold=thr,
                              num_planes=10, num_tables=num_tables)
        return {r["vec_id"]: r["cluster_id"] for r in out.take_all()}

    one, three = clusters(1), clusters(3)
    merged_one = {k for k, v in one.items() if v != k}
    merged_three = {k for k, v in three.items() if v != k}
    assert merged_one <= merged_three  # OR never loses a pair
    assert len(merged_three) > len(merged_one)  # and recovers missed ones


def test_incremental_exact_dedup_three_runs(ray_session, tmp_path):
    """Cross-run dedup: each run drops fps indexed by ANY prior run, dedups
    within itself first-wins, and appends only its survivors' fps."""
    import os

    import pyarrow as pa
    import ray.data

    from xhs_ocr_ray.stages.dedup import incremental_exact_dedup

    idx = str(tmp_path / "fpidx")

    def batch(rows):
        ids, fps = zip(*rows)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fp": pa.array(fps, pa.string()),
        })).repartition(2)

    # run 1: within-dup (id 1 vs 3 on fp 'a') -> survivors {1:a, 2:b}
    got1 = incremental_exact_dedup(
        batch([(1, "a"), (3, "a"), (2, "b")]), idx,
        fp_col="fp", id_col="doc_id",
    ).to_pandas().sort_values("doc_id")
    assert got1.doc_id.tolist() == [1, 2]

    # run 2: 'a' already indexed; 'c' new with a within-dup
    got2 = incremental_exact_dedup(
        batch([(10, "a"), (11, "c"), (12, "c")]), idx,
        fp_col="fp", id_col="doc_id",
    ).to_pandas().sort_values("doc_id")
    assert got2.doc_id.tolist() == [11]

    # run 3: everything seen across BOTH prior runs is dropped
    got3 = incremental_exact_dedup(
        batch([(20, "a"), (21, "b"), (22, "c"), (23, "d")]), idx,
        fp_col="fp", id_col="doc_id",
    ).to_pandas().sort_values("doc_id")
    assert got3.doc_id.tolist() == [23]

    # index layout: one run_<k> dir per call, never rewritten, each
    # hive-partitioned by key bucket with a bucket-count meta file
    runs = sorted(d for d in os.listdir(idx) if d.startswith("run_"))
    assert runs == ["run_0", "run_1", "run_2"]
    assert os.path.exists(os.path.join(idx, "_meta.json"))
    import glob

    kb_files = glob.glob(os.path.join(idx, "run_0", "kb=*", "*.parquet"))
    assert kb_files, "run dirs must be partitioned as kb=<bucket>/"
    flat = glob.glob(os.path.join(idx, "run_0", "*.parquet"))
    assert not flat, "no flat (unpartitioned) index files"


def test_incremental_dedup_reads_only_matching_index_partitions(
        ray_session, tmp_path):
    """The cumulative index must be read per-bucket, not whole: corrupt
    every OTHER bucket's index files — a run whose new rows all hash to one
    bucket must still succeed and dedup correctly (it would crash on the
    corrupted parquet if it touched any other partition)."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from xhs_ocr_ray.stages.bucketing import _add_key_bucket
    from xhs_ocr_ray.stages.dedup import incremental_exact_dedup

    idx = str(tmp_path / "fpidx")
    nb = 8
    fps = [f"fp-{i}" for i in range(64)]

    def ds_of(rows):
        ids, vals = zip(*rows)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fp": pa.array(vals, pa.string()),
        })).repartition(2)

    # run 1 indexes 64 fps spread over the 8 buckets
    incremental_exact_dedup(ds_of(list(enumerate(fps))), idx,
                            fp_col="fp", id_col="doc_id", num_buckets=nb)

    # replicate the shuffle's bucket assignment to pick a target bucket
    kb = _add_key_bucket(pa.table({"fp": pa.array(fps, pa.string())}),
                         ["fp"], nb).column("__kb").to_pylist()
    by_bucket: dict[int, list[str]] = {}
    for f, b in zip(fps, kb):
        by_bucket.setdefault(b, []).append(f)
    target = max(by_bucket, key=lambda b: len(by_bucket[b]))
    assert len(by_bucket) > 1  # corpus really spans multiple buckets

    # corrupt every index file OUTSIDE the target bucket
    n_corrupted = 0
    for f in glob.glob(os.path.join(idx, "run_*", "kb=*", "*.parquet")):
        if os.path.basename(os.path.dirname(f)) != f"kb={target}":
            with open(f, "wb") as fh:
                fh.write(b"NOT A PARQUET FILE")
            n_corrupted += 1
    assert n_corrupted > 0

    # run 2: rows all hashing to the target bucket — one already-indexed
    # dup, one fresh fp (crafted to land in the same bucket)
    dup = by_bucket[target][0]
    fresh = next(
        c for c in (f"new-{i}" for i in range(10_000))
        if _add_key_bucket(pa.table({"fp": pa.array([c], pa.string())}),
                           ["fp"], nb).column("__kb")[0].as_py() == target
    )
    got = incremental_exact_dedup(
        ds_of([(100, dup), (101, fresh)]), idx,
        fp_col="fp", id_col="doc_id", num_buckets=nb,
    ).to_pandas().sort_values("doc_id")
    assert got.doc_id.tolist() == [101]
    assert isinstance(got, pd.DataFrame)


def test_paragraph_dedup(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.dedup import paragraph_dedup

    docs = [
        {"doc_id": 1, "text": "alpha\nshared footer\nbeta"},
        {"doc_id": 2, "text": "shared footer\ngamma\n\ngamma"},
        {"doc_id": 3, "text": "shared footer"},          # fully deduped away
        {"doc_id": 4, "text": "alpha\ndelta"},
    ]
    ds = ray.data.from_items(docs, override_num_blocks=2)
    out = (paragraph_dedup(ds, text_col="text", id_col="doc_id")
           .to_pandas().set_index("doc_id").sort_index())
    # first-wins by (doc_id, position); empties dropped; doc 3 vanishes
    assert out.index.tolist() == [1, 2, 4]
    assert out.loc[1, "text_dedup"] == "alpha\nshared footer\nbeta"
    assert out.loc[2, "text_dedup"] == "gamma"
    assert out.loc[4, "text_dedup"] == "delta"


def test_repeated_window_signals(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.dedup import repeated_window_signals

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "a b c d e f g h"},   # 3 windows, 1 shared
        {"doc_id": 2, "text": "a b c d e f x y"},   # 3 windows, 1 shared
        {"doc_id": 3, "text": "zz yy xx ww vv uu tt"},  # unique
        {"doc_id": 4, "text": "short"},             # no window: excluded
    ], override_num_blocks=2)
    out = (repeated_window_signals(ds, window=6)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.index.tolist() == [1, 2, 3]
    assert out.n_windows.tolist() == [3, 3, 2]
    assert out.n_dup_windows.tolist() == [1, 1, 0]
    assert out.dup_frac.tolist() == [1 / 3, 1 / 3, 0.0]


def test_exact_dedup_combiner_bounds_exchange(ray_session):
    """VERDICT r05: the per-block first-wins combiner must bound rows
    crossing the exchange to <= 1 per key per block — a key duplicated
    across many blocks ships per-block winners, never every copy."""
    import ray.data

    from xhs_ocr_ray.stages.dedup import combine_first_wins, exact_dedup

    n_blocks, copies_per_block = 8, 500
    rows = []
    for b in range(n_blocks):
        for i in range(copies_per_block):
            rows.append({"k": "hot", "ord": b * copies_per_block + i,
                         "payload": f"p{b}-{i}"})
        rows.append({"k": f"cold{b}", "ord": b, "payload": "x"})
    ds = ray.data.from_items(rows, override_num_blocks=n_blocks)

    combined = combine_first_wins(ds, ["k"], "ord").materialize()
    # <= (1 hot + n_blocks cold-capacity) per block, NOT 4000 hot copies
    assert combined.count() <= n_blocks * (1 + n_blocks)

    out = exact_dedup(ds, ["k"], "ord").to_pandas()
    assert len(out) == 1 + n_blocks
    hot = out[out.k == "hot"].iloc[0]
    assert hot["ord"] == 0 and hot["payload"] == "p0-0"  # global first wins


def test_repeated_window_removal(ray_session):
    import ray.data

    from xhs_ocr_ray.stages.dedup import repeated_window_removal

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "a b c d e f g h"},   # shares a..f with doc 2
        {"doc_id": 2, "text": "x a b c d e f y"},
        {"doc_id": 3, "text": "unique tokens only here now ok"},
        {"doc_id": 4, "text": "tiny"},              # < window: intact
        {"doc_id": 5, "text": "   "},               # token-less: dropped
    ], override_num_blocks=2)
    out = (repeated_window_removal(ds, window=6, min_docs=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.index.tolist() == [1, 2, 3, 4]
    assert out.loc[1, "clean_text"] == "g h"
    assert out.loc[1, "n_tokens"] == 8 and out.loc[1, "n_removed"] == 6
    assert out.loc[2, "clean_text"] == "x y"
    assert out.loc[3, "clean_text"] == "unique tokens only here now ok"
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[4, "clean_text"] == "tiny"


def test_repeated_window_removal_overlapping_windows(ray_session):
    """Overlapping banned windows must union their coverage, and a window
    repeated only WITHIN one doc is not banned (distinct-doc count)."""
    import ray.data

    from xhs_ocr_ray.stages.dedup import repeated_window_removal

    ds = ray.data.from_items([
        # doc 1+2 share the run "p q r s" AND "q r s t" (overlapping)
        {"doc_id": 1, "text": "h1 p q r s t tail1"},
        {"doc_id": 2, "text": "h2 p q r s t tail2"},
        # doc 3 repeats "w w w w" twice internally — same doc, not banned
        {"doc_id": 3, "text": "w w w w m w w w w"},
    ], override_num_blocks=2)
    out = (repeated_window_removal(ds, window=4, min_docs=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "clean_text"] == "h1 tail1"
    assert out.loc[1, "n_removed"] == 5
    assert out.loc[2, "clean_text"] == "h2 tail2"
    # "w w w w" occurs in one distinct doc only -> kept whole... except the
    # window also appears at multiple offsets of doc 3 only: count(distinct
    # doc) == 1 < 2, so nothing is banned
    assert out.loc[3, "clean_text"] == "w w w w m w w w w"
    assert out.loc[3, "n_removed"] == 0


def test_incremental_minhash_dedup(ray_session):
    """Cross-run near-dup: run-2 docs equal (or near-equal) to run-1
    survivors are dropped; within-batch near-dups keep the smallest id;
    the band index accumulates hive-partitioned run dirs."""
    import os
    import shutil

    import ray.data

    from xhs_ocr_ray.stages.dedup import incremental_minhash_dedup

    idx = "/tmp/xhs_test_incr_minhash"
    shutil.rmtree(idx, ignore_errors=True)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    run1 = ray.data.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": other},
    ], override_num_blocks=2)
    run2 = ray.data.from_items([
        {"doc_id": 10, "text": base},          # dup of indexed doc 1
        {"doc_id": 11, "text": "fresh unseen words entirely different "
                               "content here truly novel"},
        {"doc_id": 12, "text": "fresh unseen words entirely different "
                               "content here truly novel"},  # in-batch dup
    ], override_num_blocks=2)

    s1 = incremental_minhash_dedup(run1, idx, text_col="text",
                                   id_col="doc_id", threshold=0.9)
    assert sorted(s1.to_pandas()["doc_id"]) == [1, 2]
    s2 = incremental_minhash_dedup(run2, idx, text_col="text",
                                   id_col="doc_id", threshold=0.9)
    assert sorted(s2.to_pandas()["doc_id"]) == [11]
    runs = sorted(d for d in os.listdir(idx) if d.startswith("run_"))
    assert runs == ["run_0", "run_1"]
    assert os.path.exists(os.path.join(idx, "_meta.json"))

    # geometry is pinned at bootstrap
    import pytest

    with pytest.raises(ValueError, match="geometry"):
        incremental_minhash_dedup(run2, idx, text_col="text",
                                  id_col="doc_id", bands=8)


def test_incremental_minhash_sweeps_stale_staging(ray_session):
    """A driver crash between bucket writes and the run-dir rename leaves
    an orphaned _staging_* dir; the next run must sweep it (ADVICE r04
    applied to the band index too)."""
    import os
    import shutil

    import ray.data

    from xhs_ocr_ray.stages.dedup import incremental_minhash_dedup

    idx = "/tmp/xhs_test_incr_mh_staging"
    shutil.rmtree(idx, ignore_errors=True)
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"}],
        override_num_blocks=1)
    incremental_minhash_dedup(ds, idx, text_col="text", id_col="doc_id")
    stale = os.path.join(idx, "_staging_deadbeef")
    os.makedirs(os.path.join(stale, "bb=0"), exist_ok=True)
    ds2 = ray.data.from_items(
        [{"doc_id": 2, "text": "one two three four five six"}],
        override_num_blocks=1)
    incremental_minhash_dedup(ds2, idx, text_col="text", id_col="doc_id")
    assert not os.path.exists(stale)
    runs = sorted(d for d in os.listdir(idx) if d.startswith("run_"))
    assert runs == ["run_0", "run_1"]


def test_incremental_exact_sweeps_stale_staging(ray_session):
    import os
    import shutil

    import ray.data

    from xhs_ocr_ray.stages.dedup import incremental_exact_dedup

    idx = "/tmp/xhs_test_incr_exact_staging"
    shutil.rmtree(idx, ignore_errors=True)
    ds = ray.data.from_items([{"doc_id": 1, "fp": "aaa"}],
                             override_num_blocks=1)
    incremental_exact_dedup(ds, idx, fp_col="fp", id_col="doc_id")
    stale = os.path.join(idx, "_staging_deadbeef")
    os.makedirs(os.path.join(stale, "kb=0"), exist_ok=True)
    ds2 = ray.data.from_items([{"doc_id": 2, "fp": "bbb"}],
                              override_num_blocks=1)
    incremental_exact_dedup(ds2, idx, fp_col="fp", id_col="doc_id")
    assert not os.path.exists(stale)


def test_minhash_paths_handle_empty_batch(ray_session):
    """An empty daily batch (every row filtered) must not crash either
    minhash path: clusters come back typed-empty and the incremental
    index still appends its (empty) run dir."""
    import os
    import shutil

    import ray.data

    from xhs_ocr_ray.stages.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_dedup,
    )

    idx = "/tmp/xhs_test_empty_mh"
    shutil.rmtree(idx, ignore_errors=True)
    empty = ray.data.from_items(
        [{"doc_id": 1, "text": "a b c"}], override_num_blocks=1
    ).filter(lambda r: False)
    assert minhash_lsh_dedup(empty, "text", "doc_id").count() == 0
    assert incremental_minhash_dedup(
        empty, idx, text_col="text", id_col="doc_id").count() == 0
    assert sorted(d for d in os.listdir(idx)
                  if d.startswith("run_")) == ["run_0"]
    real = ray.data.from_items(
        [{"doc_id": 5, "text": "one two three four five six"}],
        override_num_blocks=1)
    assert incremental_minhash_dedup(
        real, idx, text_col="text", id_col="doc_id").count() == 1
