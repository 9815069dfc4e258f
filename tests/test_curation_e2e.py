"""End-to-end corpus-curation composition: the operators are built as
DataFrame→DataFrame stages, so the full training-data path — exact dedup
→ quality gate → temperature mix → split assignment — must compose into
ONE lazy plan and stay deterministic across reruns. This is the 100 TB
curation story exercised as a single flow rather than as isolated
registry queries."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR

from stock_market_etl_pipeline_spark.functions.text import (
    md5_hash60,
    normalized_fingerprint,
)
from stock_market_etl_pipeline_spark.operators.dedup import (
    plant_exact_duplicates,
)
from stock_market_etl_pipeline_spark.sources.tables import load_table


def _curate(spark):
    docs = plant_exact_duplicates(
        load_table(spark, SF_DIR, "documents"), n=25
    )

    # 1. exact dedup: keep the min doc_id per normalized fingerprint
    fp = docs.withColumn("fp", normalized_fingerprint(F.col("text")))
    survivors = fp.withColumn(
        "keep",
        F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
    ).filter(F.col("keep") == 1).drop("keep")

    # 2. quality gate: drop very short docs (stands in for the full
    #    Gopher-style score; same filter shape)
    quality = survivors.filter(F.col("n_chars") >= 50)

    # 3. temperature mix over langs (same gate as source_temperature_mix)
    counts = quality.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n").alias("m"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang", F.sqrt(F.col("m").cast("double") / F.col("n")).alias("rate")
    )
    u = md5_hash60(F.concat_ws("|", F.lit("mix"), F.col("doc_id"))) / F.lit(
        float(1 << 60)
    )
    mixed = quality.join(F.broadcast(rates), "lang").filter(u < F.col("rate"))

    # 4. split assignment (hash mod — the train_val_split convention)
    h = md5_hash60(F.concat_ws("|", F.lit("split"), F.col("doc_id"))) % 10
    return mixed.withColumn(
        "split",
        F.when(h < 8, "train").when(h < 9, "val").otherwise("test"),
    )


def test_curation_pipeline_composes_and_is_deterministic(spark):
    out = _curate(spark)
    rows = out.select("doc_id", "fp", "lang", "split").collect()
    n_raw = load_table(spark, SF_DIR, "documents").count()

    # dedup really ran: planted twins are gone, fingerprints unique
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps))
    assert all(r["doc_id"] < 10_000_000 for r in rows)  # twin ids all dropped

    # each stage only removes rows; the mix genuinely downsampled
    assert 0 < len(rows) < n_raw

    # split is total and roughly 80/10/10
    by_split = {s: sum(1 for r in rows if r["split"] == s) for s in ("train", "val", "test")}
    assert sum(by_split.values()) == len(rows)
    assert by_split["train"] > by_split["val"] > 0
    assert by_split["test"] > 0

    # hash-gated determinism: a full re-plan lands on the identical corpus
    again = {r["doc_id"] for r in _curate(spark).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in rows}


def test_curation_pipeline_is_one_lazy_plan(spark):
    """The composition stays one lazy DataFrame plan (nothing collected
    between stages), so Catalyst prunes and pushes through the whole
    curation flow — selecting only doc_id must drop the text column from
    the physical scan-side projection of the final join."""
    out = _curate(spark).select("doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan  # plans end-to-end, down to the source
    # column pruning pushed through the whole composition: the final
    # single-column projection must not carry text into its output
    assert out.columns == ["doc_id"]
    assert "redacted" not in plan
