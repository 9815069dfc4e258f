"""Scaling sweep beyond the bench headline set: time a list of registry
queries at two scale-factor dirs back-to-back and report per-query
scaling factors.

bench.py freezes the same 17 headline queries across rounds for
comparability; this tool answers the complementary question — does the
REST of the surface (the LSH dedup family, sketches, grouping sets,
sessionization, enumeration) also scale sub-linearly? Used for the round-4
sf0.1-vs-sf1 study (NOTES.md); /tmp/sf1 comes from tools/scale_testdata.py.

Usage: python tools/sweep_scaling.py [small_dir] [big_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_market_etl_pipeline_spark import registry  # noqa: E402
from stock_market_etl_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    # LLM / dedup / similarity scale paths
    "dedup_ngram_jaccard",
    "dedup_jaccard_lsh_verified",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_edit_distance",
    "dedup_incremental",
    "boilerplate_ngram_coverage",
    "token_frequencies",
    "doc_quality_score",
    "doc_repetition_stats",
    "source_temperature_mix",
    "global_doc_ids",
    "sequence_packing",
    "embedding_near_pairs_lsh",
    "embedding_near_pairs_lsh_hi",
    "ann_lsh_topk",
    "sketch_distinct_rollup_merge",
    "sketch_price_quantiles",
    # analytics beyond the headline set
    "session_window_stats",
    "event_funnel",
    "user_retention_cohorts",
    "revenue_grouping_sets",
    "nation_trade_balance",
    "rfm_segments",
    "market_share_by_year",
    "errors_in_sessions",
    "cumulative_active_users",
    "quarterly_close_pivot",
]


def time_query(spark, fn, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    names = sys.argv[3:] or DEFAULT_QUERIES

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    # warm codegen/JVM on one mid-weight query
    qs["token_frequencies"](spark, small).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for n in names:
        if n not in qs:
            print(f"?? unknown query {n}", file=sys.stderr)
            continue
        t_small = time_query(spark, qs[n], small)
        t_big = time_query(spark, qs[n], big)
        out[n] = {
            "small_s": t_small,
            "big_s": t_big,
            "x": round(t_big / t_small, 2) if t_small > 0 else None,
        }
        print(
            f"{n:32s} {t_small:8.3f} {t_big:8.3f}  x{out[n]['x']}",
            file=sys.stderr,
        )
    print(json.dumps({"small": small, "big": big, "queries": out}))


if __name__ == "__main__":
    main()
