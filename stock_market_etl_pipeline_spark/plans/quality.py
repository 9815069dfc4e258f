"""Declarative data-quality suite as ONE conditional-aggregate pass.

The reference runs 14 Great Expectations checks, each a separate scan
(``src/data_quality.py:8-239``). Here the whole suite collapses into a
single ``df.agg(...)`` — one job, one scan, which is the difference
between 14×100 TB and 1×100 TB of I/O at scale (SURVEY.md §2.8).

A check is (name, expression-that-counts-passing-rows, mostly-threshold).
Success mirrors GX semantics: pass_fraction ≥ mostly. Suite success is
passed/total ≥ 0.90 (reference ``src/data_quality.py:222``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    # fraction of rows passing (Column -> double in [0,1]), or a schema probe
    pass_fraction: Column | None
    mostly: float = 1.0
    # schema-level checks evaluate driver-side against df.columns
    column_exists: str | None = None


@dataclass
class CheckResult:
    name: str
    success: bool
    pass_fraction: float


def _fraction(pred: Column) -> Column:
    """Fraction of rows satisfying pred (null counts as fail, like GX)."""
    return F.avg(F.when(F.coalesce(pred, F.lit(False)), 1.0).otherwise(0.0))


def stock_quality_checks(
    price_cols: tuple[str, ...] = ("open", "high", "low", "close"),
    price_range: tuple[float, float] = (0.0, 10000.0),
    change_col: str = "daily_change_percent",
) -> list[Check]:
    """The reference's 14-expectation suite (src/data_quality.py:18-126)."""
    checks: list[Check] = []
    for c in ("symbol", "date", "close", "volume"):
        checks.append(Check(f"column_exists_{c}", None, column_exists=c))
    for c in ("symbol", "date", "close"):
        checks.append(Check(f"not_null_{c}", _fraction(F.col(c).isNotNull())))
    lo, hi = price_range
    for c in price_cols:
        checks.append(
            Check(f"range_{c}", _fraction(F.col(c).between(lo, hi)))
        )
    checks.append(Check("volume_nonnegative", _fraction(F.col("volume") >= 0)))
    checks.append(
        Check(
            f"{change_col}_within_50",
            # first row per symbol has null change; GX's between check
            # ignores nulls, so count them as passing here
            F.avg(
                F.when(F.col(change_col).isNull(), 1.0)
                .when(F.col(change_col).between(-50.0, 50.0), 1.0)
                .otherwise(0.0)
            ),
            mostly=0.95,
        )
    )
    checks.append(Check("high_gt_low", _fraction(F.col("high") > F.col("low"))))
    return checks


def run_quality_suite(
    df: DataFrame,
    checks: list[Check],
    unique_key: tuple[str, ...] | None = ("symbol", "date"),
    success_threshold: float = 0.90,
) -> tuple[bool, float, list[CheckResult]]:
    """Run all checks in one aggregate pass; returns (success, rate, results).

    The compound-uniqueness check rides in the same pass as
    ``count(*) == count(distinct key-struct)`` — no extra scan.
    """
    aggs = []
    agg_checks = [c for c in checks if c.pass_fraction is not None]
    for i, c in enumerate(agg_checks):
        aggs.append(c.pass_fraction.alias(f"__chk_{i}"))
    if unique_key:
        aggs.append(F.count(F.lit(1)).alias("__total"))
        aggs.append(
            F.countDistinct(F.struct(*unique_key)).alias("__distinct_keys")
        )
    row = df.agg(*aggs).collect()[0]

    results: list[CheckResult] = []
    for c in checks:
        if c.column_exists is not None:
            ok = c.column_exists in df.columns
            results.append(CheckResult(c.name, ok, 1.0 if ok else 0.0))
    for i, c in enumerate(agg_checks):
        frac = float(row[f"__chk_{i}"] or 0.0)
        results.append(CheckResult(c.name, frac >= c.mostly, frac))
    if unique_key:
        ok = row["__total"] == row["__distinct_keys"]
        results.append(
            CheckResult(
                "compound_unique_" + "_".join(unique_key),
                ok,
                1.0 if ok else row["__distinct_keys"] / max(row["__total"], 1),
            )
        )
    passed = sum(1 for r in results if r.success)
    rate = passed / len(results) if results else 1.0
    return rate >= success_threshold, rate, results


def save_validation_report(
    results: list[CheckResult],
    rate: float,
    success: bool,
    path: str,
    timestamp: str | None = None,
) -> dict:
    """Persist the validation outcome as a JSON artifact (machine-readable,
    unlike the reference's prose .txt — ``src/data_quality.py:242-273``).

    The report is driver-side metadata (the check results are already
    collected scalars), so this is a plain json.dump, not a Spark write.
    Returns the report dict that was written.
    """
    import json
    import os
    from datetime import datetime, timezone

    report = {
        "success": success,
        "success_rate": round(rate * 100, 1),
        "passed_checks": sum(1 for r in results if r.success),
        "total_checks": len(results),
        "failed_expectations": [
            {"expectation": r.name, "pass_fraction": round(r.pass_fraction, 6)}
            for r in results
            if not r.success
        ],
        "timestamp": timestamp
        or datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return report


def validation_aggregates(df: DataFrame) -> DataFrame:
    """Distributed (no-collect) flavor: one row of violation counts.

    This is the oracle-checkable surface of the suite (A12) — each GX
    expectation as a conditional aggregate over the ticks table.

    The duplicate-key check is a PRE-GROUPED two-stage aggregate, not
    ``count(*) − count(distinct struct)``: single-count-distinct plans
    Expand the scan ×2 through a hash aggregate keyed on every distinct
    (symbol, date) — at the sf100 probe (NOTES r5 session 4) that was a
    measured ×20 for 10× rows with GC-locker stalls, the one cliff the
    third-decade sweep found. Grouping by (symbol, date) FIRST reuses the
    exact hash partitioning ticks' own groupBy just produced (same
    attributes ⇒ Catalyst plans NO new exchange and no Expand), and the
    closing global aggregate sees one tiny row per partition.
    Re-measured after the rewrite: ×4.69 (268 s → 63 s at sf100).
    """
    c = F.col
    per_key = df.groupBy("symbol", "date").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(c("symbol").isNull(), 1).otherwise(0)).alias("__null_symbol"),
        F.sum(F.when(c("date").isNull(), 1).otherwise(0)).alias("__null_date"),
        F.sum(F.when(c("close").isNull(), 1).otherwise(0)).alias("__null_close"),
        F.sum(F.when(~c("close").between(0, 1_000_000), 1).otherwise(0)).alias("__range"),
        F.sum(F.when(c("volume") < 0, 1).otherwise(0)).alias("__neg_vol"),
        F.sum(F.when(c("high") < c("low"), 1).otherwise(0)).alias("__hl"),
    )
    n = F.sum("__n")
    return per_key.agg(
        n.cast("bigint").alias("total_rows"),
        F.sum("__null_symbol").cast("bigint").alias("null_symbol"),
        F.sum("__null_date").cast("bigint").alias("null_date"),
        F.sum("__null_close").cast("bigint").alias("null_close"),
        F.sum("__range").cast("bigint").alias("close_out_of_range"),
        F.sum("__neg_vol").cast("bigint").alias("negative_volume"),
        F.sum("__hl").cast("bigint").alias("high_lt_low"),
        (n - F.count(F.lit(1))).cast("bigint").alias("duplicate_keys"),
    )
