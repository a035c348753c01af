"""Local replica of the driver's correctness gate: run every ``queries()``
entry AND its ``oracle_sql()`` DuckDB equivalent at a given sf dir, compare
row count, schema (column names), and a value hash over rows sorted by all
columns. Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # normalize ints that drifted to float (should not happen; surface it)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df):
    import pandas as pd

    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            got = _canon(_to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"query_error: {e!r}"[:300]}
            print(f"{name}: QUERY ERROR {e!r}", flush=True)
            continue
        if sql is None:
            results[name] = {"rows": len(got), "err": "no_oracle"}
            print(f"{name}: rows={len(got)} (no_oracle)", flush=True)
            continue
        try:
            want = _canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle_error: {e!r}"[:300]}
            print(f"{name}: ORACLE ERROR {e!r}", flush=True)
            continue
        rows_match = len(got) == len(want)
        schema_match = list(got.columns) == list(want.columns)
        hash_match = False
        if rows_match and schema_match:
            try:
                hash_match = _hash(got) == _hash(want)
            except TypeError:
                hash_match = got.astype(str).equals(want.astype(str))
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "rows": len(got), "oracle_rows": len(want),
        }
        flag = "OK" if (rows_match and schema_match and hash_match) else "MISMATCH"
        print(f"{name}: {flag} rows={len(got)}/{len(want)} "
              f"schema={schema_match} hash={hash_match}", flush=True)
        if flag == "MISMATCH" and rows_match and schema_match:
            diff = got.compare(want) if got.shape == want.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))

    bad = [k for k, v in results.items()
           if v.get("err") not in (None, "no_oracle")
           or (v.get("rows_match") is False or v.get("schema_match") is False
               or v.get("hash_match") is False)]
    print(json.dumps({"bad": bad, "n": len(results)}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
