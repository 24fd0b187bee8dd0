"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and, where an
``oracle_sql()`` entry exists, the SQL on DuckDB over the same parquet —
then compares row count, sorted column names, dtypes (loosely), and
values order-insensitively (exact, after the queries' own rounding).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists/arrays -> tuples so they sort/compare
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype) in ("int32", "int16", "int8", "uint32", "bool"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = norm(sdf), norm(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if str(s[c].dtype) != str(o[c].dtype):
            problems.append(f"dtype[{c}]: spark={s[c].dtype} oracle={o[c].dtype}")
        try:
            if s[c].dtype == np.float64:
                eq = (sv == ov) | (np.isnan(sv.astype(float)) & np.isnan(ov.astype(float)))
            else:
                eq = sv == ov
            bad = int((~eq).sum())
        except Exception as exc:  # noqa: BLE001
            problems.append(f"compare[{c}] failed: {exc}")
            continue
        if bad:
            i = int(np.argmax(~eq))
            problems.append(f"values[{c}]: {bad}/{len(sv)} differ; first row {i}: "
                            f"spark={sv[i]!r} oracle={ov[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pagerank_spark.session import get_spark

    spark = get_spark("check_entry", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark query raised: {exc}")
            failures += 1
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(sdf)} rows ({spark_s:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN  {name}: 0 rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(sdf)} rows, {spark_s:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"MATCH {name}: {len(sdf)} rows ({spark_s:.1f}s)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
