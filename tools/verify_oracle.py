"""Local stand-in for the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, null-safe, exact string equality on the canonicalized
cells). Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from stock_market_etl_pipeline_spark import registry  # noqa: E402
from stock_market_etl_pipeline_spark.session import get_spark  # noqa: E402
from stock_market_etl_pipeline_spark.sources.tables import TABLE_NAMES  # noqa: E402


# The driver canonicalizes floats as repr(round(v, 9)). A 1-ulp
# cross-engine divergence is invisible at 9dp unless it crosses a
# half-step (probability ~ ulp(v)/1e-9 — see NOTES rule 13), so
# SPARK_GRAFT_CANON_DP=12 runs the same compare as a STRESS canon that
# surfaces latent divergences before they ever cross the driver's
# boundary. 9 stays the default = the driver's actual gate.
CANON_DP = int(os.environ.get("SPARK_GRAFT_CANON_DP", "9"))


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: round-trip repr of the double
        return repr(round(v, CANON_DP))
    return repr(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in idx) for r in rows)


def duck_connect(sf_dir: str):
    """DuckDB connection with every engine table registered as a view —
    the driver's oracle-side setup. Handles both the single-file testdata
    layout ('<t>.parquet') and the directory-of-files layout
    tools/scale_testdata.py writes ('<t>.parquet/part-*')."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = Path(sf_dir) / f"{t}.parquet"
        src = f"'{path}/*.parquet'" if path.is_dir() else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def compare_query(spark, con, sf_dir: str, name: str, fn, sql: str) -> list[str]:
    """Run one registry query on Spark and its oracle SQL on DuckDB;
    return the list of mismatch descriptions (empty = parity). Mirrors
    the driver's row-count + column-name + order-insensitive value
    comparison. Reused by tests/test_oracle_parity.py (`pytest -m
    oracle`) so full-registry parity is a pytest invariant, not a
    round-close ritual."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.sql(sql)
    ocols = res.columns
    orows = res.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
    if not problems:
        a, b = canon_rows(scols, srows), canon_rows(ocols, orows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            problems.append(f"values differ, e.g. {diffs}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duck_connect(sf_dir)
    spark = get_spark("verify-oracle")
    spark.sparkContext.setLogLevel("WARN")

    qs = registry.queries()
    oracles = registry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = len(fn(spark, sf_dir).collect())
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"FAIL  {name}: spark error: {e}")
                continue
            print(f"skip  {name}: no oracle (rows={n})")
            continue
        try:
            problems = compare_query(spark, con, sf_dir, name, fn, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: error: {e}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
