"""Build a deliberately SKEWED variant of a scaled testdata dir for the
AQE skew evidence (VERDICT r11 #5).

Two hot keys are injected, each absorbing ~50% of its fact table:

- ``lineitem``: half of all rows get ``l_suppkey = <hot supplier>`` —
  the ticks() symbol axis, so every per-symbol window/groupBy downstream
  sees one partition with 50% of the data (the classic hot-entity skew a
  1000-executor cluster meets when one ticker dominates the tape). The
  SAME rows also get ``l_orderkey = <hot order>`` so the lineitem⋈orders
  SortMergeJoin (priority_revenue et al.) carries a genuinely skewed
  join key and AQE's OptimizeSkewedJoin has something to split.
  ``l_partkey`` is left alone so part-grain joins keep their structure.
- ``events``: half of all rows get ``user_id = <hot user>`` (one bot
  user dominating the event stream) for the sessionization family.

Every other table is hard-linked (not copied) from the source dir.
Deterministic: row i is reassigned iff i % 2 == 0.

Usage: python tools/make_skewed_testdata.py [SRC] [DST]
       python tools/make_skewed_testdata.py /tmp/sf1 /tmp/sf1skew
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _skew_column(src: str, dst: str, tbl: str, cols: list[str]) -> None:
    """Rewrite tbl so ~half of all rows carry one hot key in each col."""
    srcp = os.path.join(src, f"{tbl}.parquet")
    t = pq.read_table(srcp)
    import numpy as np

    for col in cols:
        hot = pa.compute.min(t[col]).as_py()  # existing key: FK-valid
        vals = t[col].to_numpy(zero_copy_only=False).copy()
        idx = np.arange(len(vals))
        vals[idx % 2 == 0] = hot
        t = t.set_column(
            t.schema.get_field_index(col), col,
            pa.array(vals, type=t[col].type),
        )
        frac = (vals == hot).mean()
        print(f"  {tbl}.{col}: hot key {hot} now {frac:.1%} of {len(vals)} rows")
    outdir = os.path.join(dst, f"{tbl}.parquet")
    os.makedirs(outdir, exist_ok=True)
    # keep multiple row groups/files so Spark still gets input splits
    n = max(4, t.num_rows // 2_000_000)
    step = (t.num_rows + n - 1) // n
    for i in range(n):
        pq.write_table(
            t.slice(i * step, step), os.path.join(outdir, f"part-{i:03d}.parquet")
        )


def _link_table(src: str, dst: str, tbl: str) -> None:
    s = os.path.join(src, f"{tbl}.parquet")
    d = os.path.join(dst, f"{tbl}.parquet")
    if os.path.isdir(s):
        os.makedirs(d, exist_ok=True)
        for f in os.listdir(s):
            if not f.startswith((".", "_")):
                target = os.path.join(d, f)
                if not os.path.exists(target):
                    os.link(os.path.join(s, f), target)
    elif not os.path.exists(d):
        os.link(s, d)
    print(f"  {tbl}: linked")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew"
    os.makedirs(dst, exist_ok=True)
    print(f"skewing {src} -> {dst}")
    _skew_column(src, dst, "lineitem", ["l_suppkey", "l_orderkey"])
    _skew_column(src, dst, "events", ["user_id"])
    for tbl in (
        "orders", "customer", "supplier", "part", "nation", "region",
        "documents", "embeddings",
    ):
        _link_table(src, dst, tbl)


if __name__ == "__main__":
    main()
