"""Local replica of the driver's oracle comparison: run each queries()[k]
on Spark and oracle_sql()[k] on DuckDB over the same parquet tables, sort
columns by name and rows by value, and compare.

Usable standalone:  python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                canon_row.append(v.isoformat())
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, str]:
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    # local-gate extras: oracled queries beyond the driver's 50-slot cap
    # run under the exact same comparison protocol here
    if hasattr(entrymod, "extra_queries"):
        qs.update(entrymod.extra_queries())
        oracles.update(entrymod.extra_oracle_sql())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results: dict[str, str] = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK_ERROR: {type(e).__name__}: {str(e)[:200]}"
            continue
        if name not in oracles:
            results[name] = f"ROWS_ONLY: {len(sdf)} rows"
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {type(e).__name__}: {str(e)[:200]}"
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            results[name] = f"SCHEMA_MISMATCH: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            continue
        a, b = _canon(sdf), _canon(odf)
        if len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH: spark={len(a)} oracle={len(b)}"
        elif a != b:
            diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            results[name] = (
                f"VALUE_MISMATCH at sorted-row {diff}:\n  spark : {a[diff]}\n  oracle: {b[diff]}"
            )
        else:
            results[name] = f"OK ({len(a)} rows)"
    return results


if __name__ == "__main__":
    from semantic_log_detector_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = get_spark(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    res = compare(spark, sf_dir, names)
    n_ok = sum(1 for v in res.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k in sorted(res):
        print(f"{k:32s} {res[k]}")
    print(f"\n{n_ok}/{len(res)} clean")
    spark.stop()
