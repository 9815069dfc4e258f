"""VERDICT r12 #3: prove (or revert) the priority_revenue pre-aggregate
at the scale where it can win.

Interleaved A/B of the OLD (pre-r12: raw lineitem ⋈ orders, 4-level
aggregate with COUNT DISTINCT expand) vs the NEW (r12: lineitem
pre-aggregated per orderkey below the SMJ) form, min-of-N through the
noop sink, at any SF dir.

Usage: python tools/probe_r13_priority.py /tmp/sf1 [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stock_market_etl_pipeline_spark.registry import cents  # noqa: E402
from stock_market_etl_pipeline_spark.registry_ext2 import (  # noqa: E402
    q_priority_revenue,
)
from stock_market_etl_pipeline_spark.session import get_spark  # noqa: E402
from stock_market_etl_pipeline_spark.sources.tables import load_table  # noqa: E402


def q_priority_revenue_old(spark, sf_dir):
    """The pre-r12 form, reconstructed from git history (commit edb7390's
    parent): raw lineitem joined to orders, COUNT DISTINCT above the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").hint("merge")
    j = orders.join(li, orders.o_orderkey == li.l_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
        (
            F.sum(
                cents("l_extendedprice")
                * (F.lit(100) - cents("l_discount"))
            )
            / F.lit(10000.0)
        ).alias("revenue"),
    )


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r13-priority")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {"old": q_priority_revenue_old, "new": q_priority_revenue}
    # warm-up (codegen/footers) once each
    for name, fn in variants.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"priority_revenue:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for name, reps_ in times.items():
        print(f"{name}: min={min(reps_):.3f} reps={reps_}")
    # results must agree (sorted rows) — the equivalence spot-check
    old_rows = sorted(map(tuple, variants["old"](spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, variants["new"](spark, sf_dir).collect()))
    print("rows_equal:", old_rows == new_rows)


if __name__ == "__main__":
    main()
