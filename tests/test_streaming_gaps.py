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
import pytest

# Long-matrix tier (VERDICT r12 #1): multi-batch streaming / replay /
# restart-storm e2e tests. Excluded from the default run so the driver's
# verify window fits; run with `python -m pytest tests/ -m slow -q` (the
# round close-out ritual runs all tiers).
pytestmark = pytest.mark.slow



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


def test_composed_out_of_order_pipeline(spark, tmp_path, monkeypatch):
    """VERDICT r11 #3: the module docstring prescribes fronting an
    out-of-order/duplicated feed with the watermarked dedup ingest —
    run that COMPOSED pipeline (landing → start_event_feed_ingest →
    staged drops → start_gap_monitor) against an adversarial storm and
    assert (a) the gap multiset matches the in-order run and the batch
    query's definition, (b) duplicates of already-consumed events are
    dropped BEFORE the monitor (a surviving duplicate would merge
    behind the stored session end and re-emit a spurious gap), and
    (c) gap emission is exactly-once across a monitor crash-replay."""
    d = _dirs(tmp_path)
    d["staging"] = str(tmp_path / "staging")
    d["ckpt1"] = str(tmp_path / "ckpt1")
    os.makedirs(d["landing"])

    from stock_market_etl_pipeline_spark.streaming.gaps import (
        start_event_feed_ingest,
    )

    def _run_ingest():
        q = start_event_feed_ingest(
            spark, d["landing"], d["staging"], d["ckpt1"]
        )
        q.awaitTermination(240)
        q.stop()
        for _ in range(300):
            if all(a.id != q.id for a in spark.streams.active):
                break
            time.sleep(0.1)
        # stamp the fresh drop's files so the monitor's file source
        # sees strictly increasing mtimes across drains
        for root, _dirs_, files in os.walk(d["staging"]):
            for f in files:
                _LAND_SEQ[0] += 1
                t = time.time() + _LAND_SEQ[0]
                os.utime(os.path.join(root, f), (t, t))

    def _run_monitor():
        q = start_gap_monitor(
            spark, d["staging"] + "/*", d["state"], d["ckpt"]
        )
        q.awaitTermination(240)
        q.stop()
        for _ in range(300):
            if all(a.id != q.id for a in spark.streams.active):
                return
            time.sleep(0.1)
        raise AssertionError("monitor did not deregister")

    # wave 1: EVENTS landed REVERSED across three files, every event
    # duplicated in a second file — landing order is adversarial
    rev = list(reversed(EVENTS))
    _land(d, rev[:3], "w1a.json")
    _land(d, rev[3:] + rev[:2], "w1b.json")   # overlap duplicates
    _land(d, rev[2:5], "w1c.json")            # more duplicates
    _run_ingest()
    _run_monitor()
    assert _gaps(spark, d) == WANT, "composed wave-1 gaps diverged"

    # wave 2: new events out of order PLUS re-sent duplicates of
    # already-consumed wave-1 events. (1, 13:00) is the poison pill:
    # undeduped it reaches the monitor behind user 1's stored end
    # (15:00) and re-emits a spurious 7200 s gap.
    wave2 = [
        (1, "2024-01-01T16:30:00"),   # gap 5400 for user 1
        (1, "2024-01-01T13:00:00"),   # duplicate (poison pill)
        (2, "2024-01-01T13:00:00"),   # gap 3300 for user 2
        (2, "2024-01-01T12:00:00"),   # duplicate
    ]
    _land(d, wave2[1:], "w2a.json")
    _land(d, wave2[:1], "w2b.json")
    _run_ingest()
    # the staged wave-2 drop carries ONLY the two genuinely-new events
    # (the drop id is not batch-1: availableNow appends a no-data batch
    # to advance the watermark, so locate the NEWEST drop instead)
    newest = max(
        os.listdir(d["staging"]), key=lambda n: int(n.split("-")[1])
    )
    staged2 = spark.read.schema("user_id long, ts timestamp").json(
        os.path.join(d["staging"], newest)
    )
    assert staged2.count() == 2, "dedup front let a duplicate through"
    _run_monitor()
    want2 = sorted(WANT + [(1, 5400), (2, 3300)])
    assert _gaps(spark, d) == want2, "composed wave-2 gaps diverged"

    # exactly-once across a monitor crash-replay of the last batch
    _crash_last_commit(d["ckpt"])
    _run_monitor()
    assert _gaps(spark, d) == want2, "monitor replay diverged"

    # batch parity: the registered quartile query over the deduped
    # event set computes its quartiles from the SAME gap multiset
    all_events = sorted(set(EVENTS + [(u, ts) for u, ts in wave2]))
    ev = spark.createDataFrame(
        [(i, u, datetime.fromisoformat(ts), "a", 1.0)
         for i, (u, ts) in enumerate(all_events)],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    monkeypatch.setattr(st4, "load_events", lambda sp, dd: ev)
    out = st4.q_intersession_gap_quartiles(spark, SF_DIR).collect()[0]
    assert out.n_gaps == len(want2)
    assert (out.q1_s, out.median_s, out.q3_s) == (3000, 3300, 5400)
