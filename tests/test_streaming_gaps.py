"""Streaming inter-session gap monitor (streaming/gaps.py): batch
parity against the registered quartile query's gap definition,
invariance to micro-batch boundaries, and crash-replay exactly-once."""

import json
import os
import time
from datetime import datetime

import stock_market_etl_pipeline_spark.registry_stats4 as st4
from stock_market_etl_pipeline_spark.streaming.gaps import (
    gap_histogram_frame,
    start_gap_monitor,
    _tables,
)

from conftest import SF_DIR


def _dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("landing", "state", "ckpt")}


_LAND_SEQ = [0]


def _land(d, events, name):
    """events: list of (user_id, 'YYYY-MM-DDTHH:MM:SS'). Files written
    in one test tick share an mtime, and FileStreamSource orders ties
    arbitrarily — stamp strictly increasing mtimes so the landing order
    IS the processing order (the monitor's documented in-order
    contract)."""
    path = os.path.join(d["landing"], name)
    with open(path, "w") as f:
        for uid, ts in events:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")
    _LAND_SEQ[0] += 1
    t = time.time() + _LAND_SEQ[0]
    os.utime(path, (t, t))


def _run(spark, d):
    q = start_gap_monitor(spark, d["landing"], d["state"], d["ckpt"])
    q.awaitTermination(240)
    q.stop()
    for _ in range(300):
        if all(a.id != q.id for a in spark.streams.active):
            return
        time.sleep(0.1)
    raise AssertionError("query did not deregister")


def _crash_last_commit(ckpt: str) -> None:
    cdir = os.path.join(ckpt, "commits")
    nums = [
        int(f.lstrip(".").split(".")[0])
        for f in os.listdir(cdir)
        if not f.startswith(".")
    ]
    n = max(nums)
    for f in os.listdir(cdir):
        if f.lstrip(".").split(".")[0] == str(n):
            os.remove(os.path.join(cdir, f))


def _gaps(spark, d):
    from stock_market_etl_pipeline_spark.operators.txtable import (
        SnapshotUnavailable,
    )

    t = _tables(d["state"])
    try:
        return sorted(
            (r.user_id, r.gap_s)
            for r in t["gaps"].read(spark).collect()
        )
    except SnapshotUnavailable:
        return []  # no gap completed yet: the table has no commits


# user 1: sessions [12:00-12:10], [13:00-13:05], [15:00] ->
#   gaps 3000 s and 6900 s
# user 2: single session -> no gaps
EVENTS = [
    (1, "2024-01-01T12:00:00"), (1, "2024-01-01T12:10:00"),
    (1, "2024-01-01T13:00:00"), (1, "2024-01-01T13:05:00"),
    (1, "2024-01-01T15:00:00"),
    (2, "2024-01-01T12:00:00"), (2, "2024-01-01T12:05:00"),
]
WANT = [(1, 3000), (1, 6900)]


def test_single_batch_matches_batch_definition(spark, tmp_path, monkeypatch):
    d = _dirs(tmp_path)
    os.makedirs(d["landing"])
    _land(d, EVENTS, "b0.json")
    _run(spark, d)
    assert _gaps(spark, d) == WANT

    # histogram view agrees with the raw gaps
    hist = {r.gap_min: r.n_gaps
            for r in gap_histogram_frame(spark, d["state"]).collect()}
    assert hist == {50: 1, 115: 1}

    # and the registered batch query computes its quartiles over the
    # SAME gap multiset
    ev = spark.createDataFrame(
        [(i, u, datetime.fromisoformat(ts), "a", 1.0)
         for i, (u, ts) in enumerate(EVENTS)],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    monkeypatch.setattr(st4, "load_events", lambda sp, dd: ev)
    out = st4.q_intersession_gap_quartiles(spark, SF_DIR).collect()[0]
    assert out.n_gaps == len(WANT)
    assert (out.q1_s, out.median_s, out.q3_s) == (3000, 3000, 6900)


def test_batch_boundaries_do_not_change_gaps(spark, tmp_path):
    """The same events split so a SESSION SPANS a batch boundary (and a
    gap completes across another) emit the identical gap multiset."""
    d = _dirs(tmp_path)
    os.makedirs(d["landing"])
    _land(d, EVENTS[:2], "b0.json")          # open session only
    _land(d, EVENTS[2:3], "b1.json")         # closes gap 1, opens next
    _land(d, EVENTS[3:5], "b2.json")         # extends, closes gap 2
    _land(d, EVENTS[5:], "b3.json")          # user 2 entirely
    _run(spark, d)
    assert _gaps(spark, d) == WANT


def test_gap_monitor_survives_restart_storm(spark, tmp_path):
    """Crash the checkpoint commit after every batch and replay: state
    recovery re-emits the same gaps and the txn-marked appends +
    cdc-marked view refreshes converge with no duplicates."""
    d = _dirs(tmp_path)
    os.makedirs(d["landing"])
    batches = [EVENTS[:2], EVENTS[2:3], EVENTS[3:5], EVENTS[5:]]
    for i, b in enumerate(batches):
        _land(d, b, f"b{i}.json")
        _run(spark, d)
        once = _gaps(spark, d)
        _crash_last_commit(d["ckpt"])
        _run(spark, d)
        assert _gaps(spark, d) == once, f"replay diverged at batch {i}"
    assert _gaps(spark, d) == WANT
    hist = {r.gap_min: r.n_gaps
            for r in gap_histogram_frame(spark, d["state"]).collect()}
    assert hist == {50: 1, 115: 1}
