"""End-to-end ETL pipeline orchestration (reference §3.1 lifecycle).

The reference's ``run_etl_pipeline`` (``src/pipeline.py:119-378``) runs
extract → transform → validate → load → summary → alert as eager stages.
Here the whole thing is ONE lazy plan graph with two actions:

1. the quality-suite aggregate (validation gate, ≥90% like the reference —
   which also proceeds to load on warning, ``pipeline.py:244``)
2. the sink write (which also executes clean + enrich)

plus a cheap summary aggregate at the end. Alerts are returned as data
(result records), not side effects — the scheduler/mailer glue the
reference bakes in (``scheduler.py``, ``src/alerts.py``) stays out of the
engine by design (SURVEY.md §7.8).

Run: ``python -m stock_market_etl_pipeline_spark.pipeline <in> <out>``
where <in> is a directory of raw-quote JSON/parquet drops.
"""

from __future__ import annotations

import sys
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession

from .io_sink import write_parquet
from .operators.clean import clean_quotes
from .operators.enrich import enrich
from .plans.analytics import db_summary
from .plans.quality import (
    run_quality_suite,
    save_validation_report,
    stock_quality_checks,
)
from .schema import RAW_QUOTE_SCHEMA
from .session import get_spark


@dataclass
class PipelineResult:
    success: bool
    validation_rate: float
    validation_passed: bool
    records_loaded: int
    unique_symbols: int
    sink_path: str
    report_path: str | None = None
    checks_passed: int = 0
    checks_total: int = 0
    corrupt_records: int = 0


def health_check(spark: SparkSession) -> bool:
    """S14: SELECT 1 liveness probe (reference ``dashboard/app.py:125-137``
    pings the database the same way before rendering)."""
    try:
        return spark.sql("SELECT 1 AS ok").collect()[0]["ok"] == 1
    except Exception:  # noqa: BLE001
        return False


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    sink_path: str,
    input_format: str = "json",
    validation_threshold: float = 0.90,
    report_path: str | None = None,
) -> PipelineResult:
    if not health_check(spark):
        raise RuntimeError("Spark session failed the SELECT 1 health probe")
    corrupt_records = 0
    raw_cached: DataFrame | None = None
    if input_format == "json":
        # PERMISSIVE + corrupt-record column: malformed JSON lines land in
        # __corrupt instead of silently becoming all-null rows; they are
        # counted, surfaced on the result, and excluded from the load.
        # (Spark requires the frame cached to filter on the corrupt column.)
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        schema = T.StructType(
            RAW_QUOTE_SCHEMA.fields
            + [T.StructField("__corrupt", T.StringType(), True)]
        )
        # keep a handle to the CACHED frame: unpersist is non-cascading and
        # matches by sameResult, so unpersisting the filtered/dropped child
        # would leave the cached full input pinned for the session
        raw_cached = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "__corrupt")
            .json(input_path)
            .cache()
        )
        corrupt_records = raw_cached.filter(F.col("__corrupt").isNotNull()).count()
        raw = raw_cached.filter(F.col("__corrupt").isNull()).drop("__corrupt")
    else:
        raw = spark.read.schema(RAW_QUOTE_SCHEMA).parquet(input_path)
    enriched = enrich(
        clean_quotes(raw).drop("extracted_at", "data_source")
    )
    # cache: the quality gate, the sink write, and the summary all read this
    enriched = enriched.cache()
    try:
        ok, rate, results = run_quality_suite(
            enriched, stock_quality_checks(), success_threshold=validation_threshold
        )
        if report_path:
            save_validation_report(results, rate, ok, report_path)
        # reference proceeds to load even on warning (pipeline.py:244)
        write_parquet(enriched, sink_path)
        summary = db_summary(enriched).collect()[0]
        return PipelineResult(
            success=True,
            validation_rate=rate,
            validation_passed=ok,
            records_loaded=summary["total_records"],
            unique_symbols=summary["unique_symbols"],
            sink_path=sink_path,
            report_path=report_path,
            checks_passed=sum(1 for r in results if r.success),
            checks_total=len(results),
            corrupt_records=corrupt_records,
        )
    finally:
        enriched.unpersist()
        if raw_cached is not None:
            raw_cached.unpersist()


def main() -> None:
    if len(sys.argv) != 3:
        print(
            "usage: python -m stock_market_etl_pipeline_spark.pipeline "
            "<input_dir> <sink_dir>",
            file=sys.stderr,
        )
        raise SystemExit(2)
    spark = get_spark("etl-pipeline")
    result = run_pipeline(spark, sys.argv[1], sys.argv[2])
    print(asdict(result))


if __name__ == "__main__":
    main()
