"""Round-12 optimization profiler: per-headline-query plan dump + timing.

Usage:
    python tools/profile_r12.py [sf_dir] [--tag=before|after] [--reps=N]
                                [--only=name1,name2]

For every bench.py HEADLINE query:
  - writes `plans/r12/<query>_<tag>.txt` with explain("formatted")
  - times N noop-sink reps (interleaved passes, min kept) with the job
    labelled via setJobDescription (guide §1.5)
Prints one JSON line {"queries": {...}, "tag": ..., "sf_dir": ...} so
before/after comparisons are mechanical.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stock_market_etl_pipeline_spark import registry  # noqa: E402
from stock_market_etl_pipeline_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402  (repo root on path)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    tag = "before"
    reps = 3
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("profile-r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [n for n in bench.HEADLINE if n in qs]
    if only:
        names = [n for n in names if n in only]

    # plan dumps (static, pre-execution — the shape evidence)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())

    # warm-up pass: codegen compile + footer reads land here (guide §1)
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    raw: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in jmap.values():
            rdd.unpersist()
        for name in names:
            spark.sparkContext.setJobDescription(f"profile[{tag}]: {name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw[name].append(round(time.perf_counter() - t0, 3))
    mins = {n: min(v) for n, v in raw.items()}
    print(json.dumps({
        "tag": tag, "sf_dir": sf_dir, "reps": reps,
        "total": round(sum(mins.values()), 3),
        "queries": mins, "raw": raw,
    }))


if __name__ == "__main__":
    main()
