"""Distributed connected components + cluster assignment.

The scale-safe replacement for a driver-side union-find over candidate
pairs: min-label propagation expressed entirely as bucketed Ray Data
shuffles, so no pair list, label table, or signature set is ever collected
on the driver (VERDICT r01: the near-dup family's 100-TB blocker).

Algorithm (standard iterated min-label propagation):

1. symmetrize edges ``(a, b)`` → ``(src, dst)`` both directions;
2. init ``labels(node) = node`` (one dedup shuffle over edge endpoints);
3. repeat until no label changes (O(log diameter) rounds via pointer
   jumping — near-dup clusters are shallow cliques, so typically 2 rounds):
   a. *propagate*: each edge forwards ``label[src]`` to ``dst``, AND each
      label row forwards ``label[label[node]]`` to ``node`` (the label
      table doubles as shortcut edges — pointer jumping, which turns an
      L-hop chain into O(log L) rounds instead of O(L));
   b. *combine*: ``label[node] = min(label[node], incoming labels)``
      (one bucketed groupby-min shuffle), counting changed labels;
4. the converged label of a node is the minimum node id of its component —
   exactly what a union-find with min-root merging computes.

Per round the data moved is O(|edges| + |nodes-in-edges|) narrow rows —
independent of corpus size. The per-round driver sync is a single scalar
(``n_changed``). Labels are materialized per round (they are the bounded
frontier set, not the corpus).

All ids flow through pandas object/int64 columns; ``min`` on strings is
lexicographic in both pandas and Python, so cluster ids match the previous
driver union-find for int and str keys alike.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from xhs_ocr_ray.stages.bucketing import (
    _add_key_bucket,
    default_num_buckets,
    group_apply,
)

MAX_ITERS = 50
_ROWS_PER_BLOCK = 500_000  # compaction target for the small label/edge sets

# Small-graph fast path: a pair set at or below this row count is collected
# (BOUNDED — never an unbounded driver materialization) and solved with a
# local union-find; larger graphs run the distributed propagation. Both paths
# produce identical labels (min member id per component).
DRIVER_EDGE_THRESHOLD = 200_000

# Above this many symmetrized edge rows, per-round state (edges + labels)
# lives in parquet instead of materialized object-store blocks: O(log
# diameter) rounds each pin edges+labels otherwise, and at extreme dup rates
# that standing set competes with the actual pipeline for store memory. The
# spill mirrors minhash's signature spill (dedup.py): write once, re-read
# per round, reclaim eagerly.
SPILL_THRESHOLD_ROWS = 20_000_000


def _kind_col(n: int, kind: int) -> pa.Array:
    return pa.array(np.full(n, kind, dtype=np.int8))


def _compact(ds_mat):
    """Merge a materialized Dataset's many tiny blocks (a 256-bucket groupby
    emits one block per bucket) so per-round task counts track data size,
    not bucket count. No-op when blocks are already reasonably sized."""
    target = max(1, min(ds_mat.num_blocks(),
                        int(ds_mat.count() // _ROWS_PER_BLOCK) + 1))
    if ds_mat.num_blocks() > 2 * target:
        return ds_mat.repartition(target).materialize()
    return ds_mat


def connected_components(edges_ds, *, max_iters: int = MAX_ITERS,
                         driver_threshold: int = DRIVER_EDGE_THRESHOLD,
                         spill_dir: str | None = None,
                         spill_threshold_rows: int = SPILL_THRESHOLD_ROWS):
    """``(a, b)`` edge Dataset → ``(node, label)`` Dataset for every node
    that appears in an edge; ``label`` = min node id of the component.
    Returns ``None`` when there are no edges (caller maps ids to self).

    ``driver_threshold``: edge counts at or below this take a bounded local
    union-find fast path (a dozen distributed shuffle rounds cost seconds of
    fixed latency that dwarf a 10^5-edge graph); set 0 to force the
    distributed path (tests do).

    ``spill_threshold_rows``: above this many symmetrized edge rows the
    per-round edge/label state is kept in parquet under ``spill_dir``
    (auto-created under /tmp and reclaimed before return when not given;
    caller-provided dirs are caller-owned) instead of materialized
    object-store blocks; 0 forces the spill path (tests do). Labels come
    out identical either way."""

    nb = default_num_buckets()  # resolved ONCE on the driver per run

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return pa.table(
            {"key": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges = _compact(
        edges_ds.select_columns(["a", "b"])
        .map_batches(sym, batch_format="pyarrow")
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": ["key"], "num_buckets": nb})
        .materialize()  # reused every round; O(|edges|) narrow rows
    )
    n_edges = edges.count()
    if n_edges == 0:
        return None
    if n_edges <= 2 * driver_threshold:  # edges are symmetrized (2 rows/pair)
        import ray.data

        from xhs_ocr_ray.stages.dedup import _union_find

        rows = edges.take(2 * driver_threshold)  # bounded by construction
        labels = _union_find([(r["key"], r["dst"], 0.0) for r in rows])
        items = [{"node": k, "label": v} for k, v in labels.items()]
        # from_items defaults to ~200 blocks; 200 tiny blocks poison every
        # downstream sort with per-block task overhead
        return ray.data.from_items(
            items, override_num_blocks=max(1, len(items) // _ROWS_PER_BLOCK)
        )

    spilling = n_edges > spill_threshold_rows
    sd = prev_label_dir = None
    if spilling:
        import os
        import shutil
        import tempfile
        import uuid

        from xhs_ocr_ray.functions.arrow import read_parquet_clean

        owned = spill_dir is None
        sd = spill_dir or os.path.join(
            tempfile.gettempdir(), "xhs_cc_spill", uuid.uuid4().hex
        )
        edges_path = os.path.join(sd, "edges")
        edges.write_parquet(edges_path)
        # rebinding drops the materialized blocks; every round now streams
        # the edge set from parquet instead of pinning it in the store
        edges = read_parquet_clean(edges_path)

    def persist(ds, name: str):
        """Round-state pin: materialize (+compact) normally; in spill mode
        write to parquet and hand back a lazy re-read."""
        if not spilling:
            return _compact(ds.materialize())
        path = os.path.join(sd, name)
        ds.write_parquet(path)
        return read_parquet_clean(path)

    def init_bucket(chunk: pd.DataFrame) -> pd.DataFrame:
        nodes = chunk["key"].drop_duplicates()
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = persist(
        edges.sort("__kb").map_batches(group_apply(init_bucket),                batch_size=None, batch_format=None),
        "labels_init",
    )
    if spilling:
        prev_label_dir = os.path.join(sd, "labels_init")

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"key": batch.column("key"), "dst": batch.column("dst"),
             "kind": _kind_col(batch.num_rows, 0)}
        )

    def tag_labels_as_msgs(batch: pa.Table) -> pa.Table:
        # label rows ride the same schema: "dst" carries the label value.
        return pa.table(
            {"key": batch.column("node"), "dst": batch.column("label"),
             "kind": _kind_col(batch.num_rows, 1)}
        )

    def shortcut_edges(batch: pa.Table) -> pa.Table:
        # Pointer jumping: treat (node ↔ label) as extra edges so each node
        # receives label[label[node]] (and each label root receives its
        # members' labels) — O(L)-hop chains converge in O(log L) rounds.
        nd = batch.column("node").combine_chunks()
        lb = batch.column("label").combine_chunks()
        return pa.table(
            {"key": pa.concat_arrays([lb, nd]),
             "dst": pa.concat_arrays([nd, lb]),
             "kind": _kind_col(2 * batch.num_rows, 0)}
        )

    def propagate(chunk: pd.DataFrame) -> pd.DataFrame:
        lab = chunk[chunk["kind"] == 1][["key", "dst"]].rename(
            columns={"dst": "label"}
        )
        edg = chunk[chunk["kind"] == 0][["key", "dst"]]
        m = edg.merge(lab, on="key", how="inner")
        return pd.DataFrame({"node": m["dst"], "label": m["label"]})

    def combine(chunk: pd.DataFrame) -> pd.DataFrame:
        new = chunk.groupby("node", sort=False)["label"].min()
        old = chunk[chunk["kind"] == 1].set_index("node")["label"]
        changed = (new != old.reindex(new.index)).astype("int64")
        return pd.DataFrame(
            {"node": new.index, "label": new.values, "changed": changed.values}
        )

    for round_no in range(max_iters):
        msgs = (
            edges.map_batches(tag_edges, batch_format="pyarrow")
            .union(labels.map_batches(shortcut_edges, batch_format="pyarrow"))
            .union(labels.map_batches(tag_labels_as_msgs, batch_format="pyarrow"))
            .map_batches(_add_key_bucket, batch_format="pyarrow",
                         fn_kwargs={"key_cols": ["key"], "num_buckets": nb})
            .sort("__kb")
            .map_batches(group_apply(propagate),
                           batch_size=None, batch_format=None)
        )

        def tag_msgs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("node"), "label": batch.column("label"),
                 "kind": _kind_col(batch.num_rows, 0)}
            )

        def tag_labels(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("node"), "label": batch.column("label"),
                 "kind": _kind_col(batch.num_rows, 1)}
            )

        combined = (
            msgs.map_batches(tag_msgs, batch_format="pyarrow")
            .union(labels.map_batches(tag_labels, batch_format="pyarrow"))
            .map_batches(_add_key_bucket, batch_format="pyarrow",
                         fn_kwargs={"key_cols": ["node"], "num_buckets": nb})
            .sort("__kb")
            .map_batches(group_apply(combine),
                           batch_size=None, batch_format=None)
        )
        new_labels = persist(combined, f"labels_{round_no}")
        n_changed = new_labels.sum("changed") or 0
        if spilling:
            # the previous round's label parquet is fully consumed; reclaim
            # eagerly so the spill footprint is one round, not all rounds
            labels = new_labels.drop_columns(["changed"])
            if prev_label_dir:
                shutil.rmtree(prev_label_dir, ignore_errors=True)
            prev_label_dir = os.path.join(sd, f"labels_{round_no}")
        else:
            labels = _compact(
                new_labels.drop_columns(["changed"]).materialize()
            )
        if n_changed == 0:
            break
    if spilling and owned:
        # hand back one materialized (bounded: nodes-in-edges) copy so the
        # auto-created spill dir can be reclaimed before returning — exactly
        # the minhash sig-spill lifecycle. Caller-provided dirs are left
        # alone and the returned dataset stays parquet-backed.
        labels = _compact(labels.materialize())
        shutil.rmtree(sd, ignore_errors=True)
    return labels


def assign_clusters(ds, id_col: str, labels_ds):
    """``(id_col, cluster_id)`` for every row of ``ds``: the component label
    where one exists, else the id itself (singletons). One bucketed shuffle
    over narrow ``(id)`` rows — never a driver-side dict."""
    if labels_ds is None:
        return ds.map_batches(
            lambda b: pa.table(
                {id_col: b.column(id_col), "cluster_id": b.column(id_col)}
            ),
            batch_format="pyarrow",
        )

    def tag_base(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        return pa.table(
            {"node": ids, "label": ids, "kind": _kind_col(batch.num_rows, 0)}
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("node"), "label": batch.column("label"),
             "kind": _kind_col(batch.num_rows, 1)}
        )

    def pick(chunk: pd.DataFrame) -> pd.DataFrame:
        base = chunk[chunk["kind"] == 0][["node"]]
        lab = chunk[chunk["kind"] == 1][["node", "label"]]
        if pd.api.types.is_integer_dtype(lab["label"].dtype):
            # nullable Int64 keeps missing labels out of float64: a plain
            # left merge would upcast and silently corrupt ids ≥ 2^53
            lab = lab.assign(label=lab["label"].astype("Int64"))
        m = base.merge(lab, on="node", how="left")
        m["label"] = m["label"].fillna(m["node"]).astype(m["node"].dtype)
        return pd.DataFrame({id_col: m["node"], "cluster_id": m["label"]})

    return (
        ds.select_columns([id_col])
        .map_batches(tag_base, batch_format="pyarrow")
        .union(labels_ds.map_batches(tag_labels, batch_format="pyarrow"))
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": ["node"],
                                "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(pick),
                       batch_size=None, batch_format=None)
    )
