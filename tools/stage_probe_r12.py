"""Round-12 stage decomposition: time each heavy headliner's sub-stages.

Each probe materializes a PREFIX of the query's plan with the noop sink
(guide §1.4) so the incremental cost of each stage is the delta between
consecutive probes. Run on a quiet host; 2 reps, min kept.

Usage: python tools/stage_probe_r12.py [sf_dir] [probe ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from stock_market_etl_pipeline_spark import registry  # noqa: E402
from stock_market_etl_pipeline_spark.registry import load_table  # noqa: E402
from stock_market_etl_pipeline_spark.session import get_spark  # noqa: E402


def timed(spark, label, df_fn, reps=2):
    best = None
    for _ in range(reps):
        df = df_fn()
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def probes_corpus_prep(spark, sf_dir):
    from stock_market_etl_pipeline_spark.operators.dedup import (
        _doc_shingles, capped_shingles, jaccard_pairs_from_shingles,
    )
    from stock_market_etl_pipeline_spark.registry_llm import NGRAM_MAX_DOC_FREQ
    docs = load_table(spark, sf_dir, "documents")
    out = {}
    out["scan_docs"] = timed(spark, "cp: scan", lambda: docs)
    out["shingles_explode"] = timed(
        spark, "cp: shingles", lambda: _doc_shingles(docs, 3))
    out["capped_shingles"] = timed(
        spark, "cp: capped", lambda: capped_shingles(
            docs, k=3, max_doc_freq=NGRAM_MAX_DOC_FREQ))
    def cp_ckpt():
        return capped_shingles(
            docs, k=3, max_doc_freq=NGRAM_MAX_DOC_FREQ
        ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    sh = cp_ckpt()
    out["ckpt_materialize_once"] = round(time.perf_counter() - t0, 3)
    out["jaccard_pairs_from_ckpt"] = timed(
        spark, "cp: jaccard", lambda: jaccard_pairs_from_shingles(sh, 0.5))
    out["full_query"] = timed(
        spark, "cp: full",
        lambda: registry.queries()["corpus_prep"](spark, sf_dir))
    return out


def probes_minhash(spark, sf_dir):
    from stock_market_etl_pipeline_spark.operators.dedup import (
        _doc_shingles, bucket_pairs, minhash_banded, minhash_signatures,
    )
    docs = load_table(spark, sf_dir, "documents")
    out = {}
    out["shingles_explode"] = timed(
        spark, "mh: shingles", lambda: _doc_shingles(docs, 3))
    out["signatures"] = timed(
        spark, "mh: signatures",
        lambda: minhash_signatures(docs, k=3, num_hashes=16))
    out["banded"] = timed(
        spark, "mh: banded",
        lambda: minhash_banded(docs, k=3, num_hashes=16, bands=4))
    out["full_query"] = timed(
        spark, "mh: full",
        lambda: registry.queries()["dedup_minhash_lsh"](spark, sf_dir))
    return out


def probes_gap_fill(spark, sf_dir):
    from stock_market_etl_pipeline_spark.sources.ticks import ticks
    t = ticks(spark, sf_dir)
    out = {}
    out["scan_ticks"] = timed(spark, "gf: scan", lambda: t)
    bounds = t.groupBy("symbol").agg(
        F.min("date").alias("__d0"), F.max("date").alias("__d1"))
    out["bounds_agg"] = timed(spark, "gf: bounds", lambda: bounds)
    calendar = bounds.select(
        "symbol", F.explode(F.sequence("__d0", "__d1")).alias("date"))
    out["calendar"] = timed(spark, "gf: calendar", lambda: calendar)
    joined = calendar.join(t, ["symbol", "date"], "left")
    out["joined"] = timed(spark, "gf: joined", lambda: joined)
    out["full_query"] = timed(
        spark, "gf: full",
        lambda: registry.queries()["gap_fill_forward"](spark, sf_dir))
    return out


def probes_predictions(spark, sf_dir):
    qs = registry.queries()
    out = {}
    out["enriched_features"] = timed(
        spark, "pr: enrich", lambda: qs["enriched_features"](spark, sf_dir))
    out["full_query"] = timed(
        spark, "pr: full", lambda: qs["predictions"](spark, sf_dir))
    out["trading_signals"] = timed(
        spark, "pr: signals", lambda: qs["trading_signals"](spark, sf_dir))
    return out


PROBES = {
    "corpus_prep": probes_corpus_prep,
    "dedup_minhash_lsh": probes_minhash,
    "gap_fill_forward": probes_gap_fill,
    "predictions": probes_predictions,
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("-") else "/root/testdata/sf0.1"
    wanted = args[1:] if len(args) > 1 else list(PROBES)
    spark = get_spark("stage-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name in wanted:
        results[name] = PROBES[name](spark, sf_dir)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "probes": results}))


if __name__ == "__main__":
    main()
