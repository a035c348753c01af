"""Benchmark decontamination for training corpora.

Standard LLM-corpus practice (GPT-3 App. C, PaLM, Llama): flag / drop
training documents that share any word n-gram with an evaluation
benchmark, so eval scores are not inflated by memorized test items.
(The reference has no analog — this is a training-data extension in the
spirit of its dedup index, db/__init__.py:110-120.)

Two stages, shaped for the small-eval × huge-train asymmetry:

1. **Eval side** — collect the benchmark's unique n-gram hashes. Eval
   sets are small by definition (thousands of prompts vs billions of
   train docs), so each block emits ONE row holding its packed unique
   hashes (``np.uint64.tobytes()``) and the driver unions the bounded
   stream — the same domain-sized-reduce contract as the HLL registers
   (stages/sketches.py). An explicit ``max_eval_ngrams`` guard refuses a
   silent driver OOM if someone points this at a corpus-sized "eval" set.
2. **Train side** — the sorted hash array is broadcast ONCE with
   ``ray.put`` and every batch does a single vectorized ``np.searchsorted``
   membership probe over ALL its documents' shingles at once (segment
   counts via ``np.add.reduceat``), never a Python per-shingle set probe.

Hashes are the first 16 hex digits of md5 over the space-joined n-gram —
exactly ``('0x' || substr(md5(g), 1, 16))::UBIGINT`` in DuckDB, so the
oracle is hash-exact. Tokenization matches DuckDB
``list_filter(string_split(text, ' '), x -> x <> '')``:
``text.split(' ')`` with empties dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xhs_ocr_ray.functions.hashing import md5_hex


def doc_ngram_hashes(text: str | None, n: int) -> np.ndarray:
    """Unique word-n-gram 64-bit md5-prefix hashes of one document."""
    toks = [t for t in (text or "").split(" ") if t]
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return np.fromiter(
        (int(md5_hex(g)[:16], 16) for g in grams), np.uint64, len(grams))


def collect_eval_ngram_hashes(eval_ds, *, text_col: str = "text", n: int = 5,
                              max_eval_ngrams: int = 50_000_000) -> np.ndarray:
    """Sorted unique n-gram hashes of the (small) eval dataset.

    One packed-bytes row per block to the driver — bounded by the eval
    set, not the corpus. Raises if the union exceeds ``max_eval_ngrams``.
    """
    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = [doc_ngram_hashes(t, n) for t in texts]
        u = (np.unique(np.concatenate(hs)) if hs
             else np.empty(0, dtype=np.uint64))
        return pa.table({"packed": pa.array([u.tobytes()], pa.binary())})

    rows = eval_ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return np.empty(0, dtype=np.uint64)
    parts = [np.frombuffer(r["packed"], dtype=np.uint64) for r in rows]
    out = np.unique(np.concatenate(parts))
    if len(out) > max_eval_ngrams:
        raise ValueError(
            f"decontaminate: eval set has {len(out)} unique {n}-grams "
            f"(> max_eval_ngrams={max_eval_ngrams}); this broadcast design "
            f"assumes a benchmark-sized eval side — shrink it or raise the "
            f"guard explicitly")
    return out  # np.unique output is sorted


def ngram_decontaminate(train_ds, eval_hashes: np.ndarray, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5, drop: bool = False):
    """Annotate (or with ``drop=True`` filter) training docs by eval-set
    n-gram overlap. Appends ``n_ngrams`` (distinct n-grams in the doc),
    ``n_contam`` (of those, how many appear in the eval set) and
    ``contaminated``. Pure map stage — no shuffle; the eval array ships
    through the object store once per node."""
    import ray

    ev = np.ascontiguousarray(np.sort(np.asarray(eval_hashes, np.uint64)))
    ref = ray.put(ev)

    def check(batch: pa.Table) -> pa.Table:
        ev_sorted = ray.get(ref)
        texts = batch.column(text_col).to_pylist()
        per_doc = [doc_ngram_hashes(t, n) for t in texts]
        counts = np.fromiter((len(h) for h in per_doc), np.int64,
                             len(per_doc))
        if len(per_doc) and counts.sum():
            allh = np.concatenate(per_doc)
            if len(ev_sorted):
                idx = np.searchsorted(ev_sorted, allh)
                idx[idx == len(ev_sorted)] = 0
                hit = (ev_sorted[idx] == allh).astype(np.int64)
            else:
                hit = np.zeros(len(allh), dtype=np.int64)
            # segment sums over the per-doc ranges via cumsum differences
            # (robust to empty segments, unlike np.add.reduceat)
            cs = np.concatenate((np.zeros(1, np.int64), np.cumsum(hit)))
            bounds = np.concatenate(
                (np.zeros(1, np.int64), np.cumsum(counts)))
            contam = cs[bounds[1:]] - cs[bounds[:-1]]
        else:
            contam = np.zeros(len(per_doc), dtype=np.int64)
        out = batch.append_column("n_ngrams", pa.array(counts, pa.int64()))
        out = out.append_column("n_contam", pa.array(contam, pa.int64()))
        out = out.append_column(
            "contaminated", pa.array(contam > 0, pa.bool_()))
        if drop:
            out = out.filter(pa.array(contam == 0, pa.bool_()))
        return out

    return train_ds.map_batches(check, batch_format="pyarrow")


def substring_decontaminate(train_ds, probes: list[str], *,
                            text_col: str = "text", id_col: str = "doc_id",
                            drop: bool = False,
                            max_probes: int = 1_000_000):
    """Exact-substring benchmark decontamination — the verbatim-leak check
    used alongside n-gram overlap (GPT-4 tech report: 50-char substring
    samples of eval items; :func:`ngram_decontaminate` is the fuzzy
    variant). Appends ``n_probe_hits`` (how many DISTINCT probes occur
    verbatim in the doc) and ``substring_contaminated``; ``drop=True``
    filters instead.

    Shape: the probe list is eval-sized by definition (guarded by
    ``max_probes``), broadcast ONCE via ``ray.put``; each batch runs one
    vectorized ``pc.match_substring`` kernel PER PROBE across all its
    documents (vectorized over the corpus axis — the probe axis is the
    small one). No shuffle.
    """
    import ray

    probes = sorted({p for p in probes if p})
    if len(probes) > max_probes:
        raise ValueError(
            f"substring_decontaminate: {len(probes)} probes "
            f"(> max_probes={max_probes}); this broadcast-per-probe design "
            f"assumes an eval-sized probe list")
    ref = ray.put(probes)

    def check(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ps = ray.get(ref)
        texts = pc.coalesce(batch.column(text_col).combine_chunks(),
                            pa.scalar("", pa.string()))
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        for p in ps:
            hits += pc.match_substring(texts, p) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        out = batch.append_column("n_probe_hits",
                                  pa.array(hits, pa.int64()))
        out = out.append_column("substring_contaminated",
                                pa.array(hits > 0, pa.bool_()))
        if drop:
            out = out.filter(pa.array(hits == 0, pa.bool_()))
        return out

    return train_ds.map_batches(check, batch_format="pyarrow")
