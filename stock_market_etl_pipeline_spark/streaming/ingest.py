"""Structured Streaming translation of the reference's daily append cycle.

The reference reruns the batch pipeline daily, appending ~100 recent days
per symbol with overlap, then dedups on (symbol, date)
(``scheduler.py:110``, ``src/load.py:252``, ``src/transform.py:199-204``;
SURVEY.md §2.10). Here that becomes a continuous micro-batch stream:

    landing dir (JSON/parquet drops) → readStream → clean → watermarked
    keep-last dedup → foreachBatch upsert into a parquet/Delta-style sink

- The watermark bounds dedup state: late duplicates older than the horizon
  age out of state instead of accumulating forever (the unbounded-state
  bug a naive dropDuplicates would have at 100 TB).
- ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival; the
  reference's keep-LAST semantics are preserved by the foreachBatch merge,
  which applies per-batch keep-last against the sink (same tiebreak as
  operators/clean.py::dedup_keep_last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clean import dedup_keep_last
from ..schema import RAW_QUOTE_SCHEMA


def dedup_stream(stream: DataFrame, watermark_delay: str = "2 days") -> DataFrame:
    """Watermarked streaming dedup on (symbol, date).

    State is keyed by (symbol, date) and dropped once the watermark passes
    ``extracted_at + delay`` — bounded memory at any scale.
    """
    return stream.withWatermark("extracted_at", watermark_delay).dropDuplicatesWithinWatermark(
        ["symbol", "date"]
    )


def start_quote_ingest(
    spark: SparkSession,
    landing_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """File-source micro-batch ingest: landing JSON → cleaned parquet sink.

    ``foreachBatch`` writes per-micro-batch with keep-last dedup INSIDE the
    batch (cross-batch duplicates are handled by the watermark state above).
    Returns the StreamingQuery; callers await ``query.awaitTermination()``.
    """
    raw = (
        spark.readStream.schema(RAW_QUOTE_SCHEMA)
        .option("maxFilesPerTrigger", 16)  # ingestion throttle (S3 analog)
        .json(landing_dir)
    )
    deduped = dedup_stream(raw)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        resolved = dedup_keep_last(
            batch_df, keys=["symbol", "date"], order_by=["extracted_at"]
        )
        (
            resolved.write.mode("append")
            .partitionBy("symbol")
            .parquet(sink_dir)
        )

    writer = (
        deduped.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small,
    broadcast) dimension snapshot — Spark re-plans the static side per
    batch, so a refreshed dim table is picked up without restarting the
    query. The canonical pattern for enriching a quote stream with the
    company-overview fundamentals at any scale (dim is KB-sized per
    symbol universe; the stream side never shuffles for the join)."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), "symbol", "left")


def start_gated_quote_ingest(
    spark: SparkSession,
    landing_dir: str,
    sink_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    validation_threshold: float = 0.90,
    trigger_once: bool = True,
):
    """Quality-gated streaming ingest: the batch pipeline's ≥90% validation
    gate (reference ``src/pipeline.py:227-251``) applied per micro-batch.

    Each micro-batch is cleaned + enriched, then run through the one-pass
    quality suite; batches meeting the threshold append to the sink, the
    rest divert whole to a quarantine directory with the batch id — bad
    feeds never contaminate the serving table, and nothing is silently
    dropped. Returns the StreamingQuery.
    """
    from ..operators.clean import clean_quotes
    from ..operators.enrich import enrich
    from ..plans.quality import run_quality_suite, stock_quality_checks

    raw = (
        spark.readStream.schema(RAW_QUOTE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(landing_dir)
    )

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        enriched = enrich(
            clean_quotes(batch_df).drop("extracted_at", "data_source")
        ).cache()
        try:
            ok, _rate, _results = run_quality_suite(
                enriched,
                stock_quality_checks(),
                success_threshold=validation_threshold,
            )
            target = sink_dir if ok else f"{quarantine_dir}/batch_id={batch_id}"
            enriched.write.mode("append").partitionBy("symbol").parquet(target)
        finally:
            enriched.unpersist()

    writer = raw.writeStream.foreachBatch(gate_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_pipeline_stream(
    spark: SparkSession,
    landing_dir: str,
    sink_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    validation_threshold: float = 0.90,
    watermark_delay: str = "2 days",
    trigger_once: bool = True,
    exactly_once: bool = False,
):
    """The WHOLE batch pipeline as one streaming composition:

        landing JSON → watermarked cross-batch dedup → clean (incl.
        within-batch keep-last) → enrich → per-micro-batch quality gate →
        partitioned parquet sink (failing batches divert to quarantine)

    The streaming twin of ``pipeline.run_pipeline``: for a single
    availableNow drop the sink contents are row-identical to the batch
    pipeline's output (asserted in tests/test_streaming_pipeline_e2e.py).
    Enrichment windows are computed per micro-batch — matching the
    reference's daily rerun-over-recent-history model, where each drop
    carries the full lookback window it needs (scheduler.py:110).

    ``exactly_once=True`` makes the sink write REPLAY-IDEMPOTENT: each
    micro-batch overwrites its own ``batch_id=N`` subdirectory instead of
    blind-appending to the sink root. foreachBatch gives at-least-once
    delivery — a crash between the sink write and the checkpoint commit
    replays the batch on restart, and an append sink would duplicate every
    row (proven in tests/test_streaming_pipeline_e2e.py). Keyed-by-batch
    overwrite makes the replay write the SAME directory with the SAME
    deterministic content: exactly-once by idempotence, the parquet-sink
    analog of a transactional MERGE. Readers see batch_id as an ordinary
    partition column.
    """
    from ..operators.clean import clean_quotes
    from ..operators.enrich import enrich
    from ..plans.quality import run_quality_suite, stock_quality_checks

    raw = (
        spark.readStream.schema(RAW_QUOTE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(landing_dir)
    )
    deduped = dedup_stream(raw, watermark_delay)

    def pipe_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        enriched = enrich(
            clean_quotes(batch_df).drop("extracted_at", "data_source")
        ).cache()
        try:
            ok, _rate, _results = run_quality_suite(
                enriched,
                stock_quality_checks(),
                success_threshold=validation_threshold,
            )
            if exactly_once:
                target = (
                    f"{sink_dir}/batch_id={batch_id}"
                    if ok
                    else f"{quarantine_dir}/batch_id={batch_id}"
                )
                enriched.write.mode("overwrite").partitionBy(
                    "symbol"
                ).parquet(target)
            else:
                target = (
                    sink_dir if ok else f"{quarantine_dir}/batch_id={batch_id}"
                )
                enriched.write.mode("append").partitionBy("symbol").parquet(
                    target
                )
        finally:
            enriched.unpersist()

    writer = deduped.writeStream.foreachBatch(pipe_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_wap_gated_ingest(
    spark: SparkSession,
    landing_dir: str,
    table_root: str,
    quarantine_root: str,
    checkpoint_dir: str,
    validation_threshold: float = 0.90,
):
    """The quality gate as WRITE-AUDIT-PUBLISH into transactional
    tables: each micro-batch is cleaned + enriched, STAGED invisibly
    into the serving TxTable (operators/txtable.stage_wap), audited by
    the one-pass quality suite READING THE STAGED FILES (staging is the
    single materialization — no cache/unpersist dance), then atomically
    published (txn_id-idempotent) or diverted whole to a quarantine
    TxTable. start_gated_quote_ingest writes raw parquet directories;
    this is the same ≥90% gate (reference ``src/pipeline.py:227-251``)
    upgraded to the lakehouse contract: readers of the serving table see
    a batch entirely or not at all, at EVERY crash point —

    - crash before/during stage: unreferenced orphans, vacuum sweeps;
    - crash after stage, before the audit/publish: the replay finds the
      pending marker and audits THE SAME staged files (stage_wap is
      wap_id-idempotent here by reuse, not re-write);
    - crash after publish/quarantine-append, before the checkpoint
      commit: the replay sees the txn marker on whichever table won and
      drops the stale pending marker without recomputing anything —
      decisions are never re-derived against moved state (the
      semantic_dedup ADVICE-r7 lesson applied at design time).

    Returns the started StreamingQuery (availableNow).
    """
    from ..operators.clean import clean_quotes
    from ..operators.enrich import enrich
    from ..operators.txtable import AlreadyStaged, TxTable
    from ..plans.quality import run_quality_suite, stock_quality_checks

    table = TxTable(table_root)
    quarantine = TxTable(quarantine_root)
    raw = (
        spark.readStream.schema(RAW_QUOTE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(landing_dir)
    )

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        txn = f"wapgate-{batch_id}"
        wap = f"gate-{batch_id}"
        if table.txn_committed(txn) or quarantine.txn_committed(txn):
            # this batch already landed on a previous delivery; a crash
            # between the commit and the marker cleanup may have left a
            # stale pending WAP — drop it, never re-audit
            try:
                table.abort_wap(wap)
            except ValueError:
                pass
            return
        enriched = enrich(
            clean_quotes(batch_df).drop("extracted_at", "data_source")
        )
        try:
            table.stage_wap(enriched, wap)
        except AlreadyStaged:
            pass  # staged by a crashed earlier attempt: audit those files
        staged = table.read_wap(spark, wap)
        ok, _rate, _results = run_quality_suite(
            staged,
            stock_quality_checks(),
            success_threshold=validation_threshold,
        )
        if ok:
            table.publish_wap(spark, wap, txn_id=txn)
        else:
            # copy staged rows to quarantine FIRST, then release the
            # staged files (replay after a crash in between is caught
            # by the quarantine txn marker above)
            quarantine.append(staged, txn_id=txn)
            table.abort_wap(wap)

    return (
        raw.writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
