"""VERDICT r12 #4: lineage-truncation probe for the unrolled iterative
queries (part_pagerank, part_pagerank_int, markov_stationary_int,
dedup_clusters).

All three operators ALREADY checkpoint per round (operators/graph.py,
registry_ext8.py) — the open question is the checkpoint MODE and the
cost split: how much of each query's wall is the input build (edges /
transition counts) vs the 10 iteration rounds, and whether eager
(per-round blocking job) vs lazy (single fused job at the action)
checkpointing is the cheaper truncation.

Usage: python tools/probe_r13_iterative.py /root/testdata/sf0.1 [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stock_market_etl_pipeline_spark.session import get_spark  # noqa: E402


def timed(spark, label, df, reps=3):
    mins = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df().write.format("noop").mode("overwrite").save()
        mins.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(f"{label}: min={min(mins):.3f} reps={mins}")
    return min(mins)


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe-r13-iterative")
    spark.sparkContext.setLogLevel("ERROR")

    from stock_market_etl_pipeline_spark.registry_ext3 import (
        q_part_cooccurrence,
        q_part_pagerank,
    )
    from stock_market_etl_pipeline_spark.registry_ext8 import (
        q_markov_stationary_int,
    )
    from stock_market_etl_pipeline_spark.registry_llm import q_dedup_clusters

    # warm-up
    for fn in (q_part_cooccurrence, q_part_pagerank,
               q_markov_stationary_int, q_dedup_clusters):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # cost split: edge build alone vs full pagerank
    timed(spark, "edges(part_cooccurrence)",
          lambda: q_part_cooccurrence(spark, sf_dir), reps)
    timed(spark, "part_pagerank(full)",
          lambda: q_part_pagerank(spark, sf_dir), reps)
    timed(spark, "markov_stationary_int(full)",
          lambda: q_markov_stationary_int(spark, sf_dir), reps)
    # markov base: transition counts alone (the user_id window exchange)
    from stock_market_etl_pipeline_spark.sources.events import load_events
    from pyspark.sql import Window

    def markov_base():
        ev = load_events(spark, sf_dir)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = ev.select(
            F.col("event_type").alias("cur"),
            F.lag("event_type").over(w).alias("prv"),
        ).filter(F.col("prv").isNotNull())
        return seq.groupBy("prv", "cur").agg(F.count(F.lit(1)).alias("c"))

    timed(spark, "markov(base: counts only)", markov_base, reps)
    timed(spark, "dedup_clusters(full)",
          lambda: q_dedup_clusters(spark, sf_dir), reps)


if __name__ == "__main__":
    main()
