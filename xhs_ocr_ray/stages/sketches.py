"""Distributed sketches: HyperLogLog approximate count-distinct.

Exact ``count_distinct`` (``__ray_entry__._q_count_distinct``) needs a
shuffle of the (pre-deduped) key set; at 10^12 rows that exchange is the
whole job. :func:`hll_count_distinct` reduces each block to at most
``m = 2^p`` (register, max-rank) pairs inside ``map_batches``, merges them
with ONE tiny exchange (the merged sketch is ≤ m rows TOTAL, independent of
the data), and estimates the cardinality with the classic HyperLogLog
formula (Flajolet et al. 2007), including the small-range linear-counting
correction.

The sketch is built on ``md5`` (not a seeded RNG), so the whole estimate is
a DETERMINISTIC function of the distinct value set — reproducible across
runs, engines, block splits and cluster sizes, and therefore exactly
reproducible in SQL (the DuckDB oracle recomputes the registers from
``substr(md5(v), 1, 16)`` and lands on the bit-identical double; the
register sum is carried as an exact integer ``Σ 2^(maxrho - M[j])`` so no
float accumulation order is involved).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from xhs_ocr_ray.functions.arrow import arrow_from_pandas
from xhs_ocr_ray.functions.hashing import md5_hex
from xhs_ocr_ray.stages.analytics import _merge_level
from xhs_ocr_ray.stages.bucketing import default_num_buckets


def hll_alpha(p: int) -> float:
    """Bias-correction constant for ``m = 2^p`` registers (HLL paper §4)."""
    m = 1 << p
    return 0.7213 / (1 + 1.079 / m)


def _register_partial(batch: pa.Table, col: str, p: int) -> pa.Table:
    """Per-block sketch: (register index, max rank) pairs, ≤ 2^p rows.
    NULL values are skipped (SQL ``count(DISTINCT col)`` semantics)."""
    width = 64 - p
    wmask = (1 << width) - 1
    regs: dict[int, int] = {}
    for v in batch.column(col).to_pylist():
        if v is None:
            continue
        h = int(md5_hex(str(v))[:16], 16)
        idx = h >> width
        rho = width - (h & wmask).bit_length() + 1
        if rho > regs.get(idx, 0):
            regs[idx] = rho
    return arrow_from_pandas(pd.DataFrame({
        "idx": pd.Series(list(regs.keys()), dtype="int32"),
        "rho": pd.Series(list(regs.values()), dtype="int64"),
    }))


def hll_estimate(reg_idx: np.ndarray, reg_rho: np.ndarray, p: int) -> float:
    """Cardinality from merged registers. The indicator sum is the exact
    integer ``Σ_j 2^(maxrho - M[j])`` (empty registers contribute
    ``2^maxrho``), so the only float roundings are the final division and
    the fixed-order constant products — both bit-stable across engines."""
    m = 1 << p
    maxrho = 64 - p + 1
    alpha = hll_alpha(p)
    filled = int(len(reg_idx))
    v_zero = m - filled
    s = v_zero * (1 << maxrho) + int(
        sum(1 << (maxrho - int(r)) for r in reg_rho))
    e = alpha * m * m * float(1 << maxrho) / float(s)
    if e <= 2.5 * m and v_zero > 0:
        e = m * math.log(m / v_zero)  # libm log == DuckDB ln (bit-exact)
    return e


def hll_count_distinct(ds, col: str, *, p: int = 12,
                       num_buckets: int | None = None) -> float:
    """Approximate ``count(DISTINCT col)`` (~1.04/sqrt(2^p) relative error;
    p=12 → ~1.6%). One pass over the data, one exchange of ≤ 2^p rows."""
    if not (4 <= p <= 18):
        raise ValueError(f"hll_count_distinct: p must be in [4, 18], got {p}")
    nb = num_buckets or default_num_buckets()
    partial = ds.map_batches(_register_partial, batch_format="pyarrow",
                             fn_kwargs={"col": col, "p": p})
    merged = _merge_level(partial, ["idx"], {"rho": ("rho", "max")},
                          min(nb, 32)).to_pandas()
    if merged.empty:  # no non-null rows at all -> every register empty
        return hll_estimate(np.array([], dtype=np.int64),
                            np.array([], dtype=np.int64), p)
    return hll_estimate(merged["idx"].to_numpy(), merged["rho"].to_numpy(), p)


def _cms_partial(batch: pa.Table, col: str, depth: int,
                 width: int) -> pa.Table:
    """Per-block Count-Min cells: ``(row, bucket, n)``, ≤ depth × width
    rows. md5 cost is depth × DISTINCT values (block-local pre-count)."""
    from collections import Counter

    vc = Counter(v for v in batch.column(col).to_pylist() if v is not None)
    cells: Counter = Counter()
    for v, n in vc.items():
        for i in range(depth):
            b = int(md5_hex(f"{i}:{v}")[:16], 16) % width
            cells[(i, b)] += n
    keys = list(cells.keys())
    return arrow_from_pandas(pd.DataFrame({
        "row": pd.Series([k[0] for k in keys], dtype="int32"),
        "bucket": pd.Series([k[1] for k in keys], dtype="int64"),
        "n": pd.Series([cells[k] for k in keys], dtype="int64"),
    }))


def cms_estimate(ds, col: str, probes: list[str], *, depth: int = 4,
                 width: int = 1024, num_buckets: int | None = None):
    """Count-Min frequency estimates (Cormode & Muthukrishnan 2005) for
    ``probes`` over ``ds[col]``: est(v) = min over rows of
    cell[row, md5(row:v) % width] — an overestimate bounded by
    ε = e/width with prob 1 - e^-depth.

    Same deterministic-sketch contract as HLL: md5-derived buckets (no
    seeded RNG), per-block partials, ONE exchange of ≤ depth × width rows
    (domain-sized — independent of data volume), so the ESTIMATES are a
    deterministic function of the value multiset and the DuckDB oracle
    recomputes them bit-exactly. Returns a pyarrow Table
    ``(probe: string, est: int64)`` ordered as ``probes``.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"cms_estimate: bad depth={depth}/width={width}")
    nb = num_buckets or default_num_buckets()
    partial = ds.map_batches(_cms_partial, batch_format="pyarrow",
                             fn_kwargs={"col": col, "depth": depth,
                                        "width": width})
    merged = _merge_level(partial, ["row", "bucket"], {"n": ("n", "sum")},
                          min(nb, 32)).to_pandas()
    cells = {(int(r), int(b)): int(n) for r, b, n in
             zip(merged.get("row", ()), merged.get("bucket", ()),
                 merged.get("n", ()))}
    ests = []
    for v in probes:
        ests.append(min(
            cells.get((i, int(md5_hex(f"{i}:{v}")[:16], 16) % width), 0)
            for i in range(depth)))
    return pa.table({
        "probe": pa.array(list(probes), pa.string()),
        "est": pa.array(ests, pa.int64()),
    })
