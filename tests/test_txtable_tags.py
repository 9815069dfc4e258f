"""Snapshot tags on TxTable (Iceberg named-ref semantics): tags resolve
reads, survive subsequent commits, pin their snapshot's files through
vacuum, and are replay-idempotent when txn-marked."""

import pytest

from stock_market_etl_pipeline_spark.operators.txtable import (
    SnapshotUnavailable,
    TxTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double")


def test_tag_resolves_pinned_snapshot(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.create_tag("v1")
    t.append(_df(spark, [(2, 2.0)]))
    assert t.read(spark).count() == 2
    assert {r.k for r in t.read(spark, tag="v1").collect()} == {1}
    assert t.tags() == {"v1": 0}


def test_tag_carries_through_commits_and_overwrite(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.create_tag("baseline")
    t.overwrite(_df(spark, [(9, 9.0)]))
    t.append(_df(spark, [(10, 10.0)]))
    # still resolvable after unrelated history
    assert {r.k for r in t.read(spark, tag="baseline").collect()} == {1}
    # and the current table is the overwritten one
    assert {r.k for r in t.read(spark).collect()} == {9, 10}


def test_tag_create_idempotent_and_retag_refused(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.create_tag("v1")
    before = t.latest_snapshot()
    t.create_tag("v1")  # same target: no-op
    assert t.latest_snapshot() == before
    t.append(_df(spark, [(2, 2.0)]))
    with pytest.raises(ValueError, match="already points"):
        t.create_tag("v1")  # different implied target


def test_tag_unknown_refs_raise(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    with pytest.raises(SnapshotUnavailable, match="no such tag"):
        t.read(spark, tag="nope")
    with pytest.raises(SnapshotUnavailable, match="no manifest"):
        t.create_tag("x", snapshot=99)
    with pytest.raises(ValueError, match="no such tag"):
        t.delete_tag("nope")
    with pytest.raises(ValueError, match="not both"):
        t.read(spark, snapshot=0, tag="v1")


def test_vacuum_keeps_tagged_snapshot(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.create_tag("pin")
    t.overwrite(_df(spark, [(2, 2.0)]))  # old file now dead in HEAD
    t.append(_df(spark, [(3, 3.0)]))
    dropped, deleted = t.vacuum(keep_last=1)
    # the tagged snapshot's manifest AND data file survive
    assert {r.k for r in t.read(spark, tag="pin").collect()} == {1}
    assert {r.k for r in t.read(spark).collect()} == {2, 3}


def test_vacuum_reclaims_after_tag_delete(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.create_tag("pin")
    t.overwrite(_df(spark, [(2, 2.0)]))
    t.vacuum(keep_last=1)
    assert t.read(spark, tag="pin").count() == 1  # still pinned
    t.delete_tag("pin")
    t.vacuum(keep_last=1)
    with pytest.raises(SnapshotUnavailable):
        t.read(spark, snapshot=0)
    assert {r.k for r in t.read(spark).collect()} == {2}


def test_tag_creation_replay_idempotent(spark, tmp_path):
    """A streaming job tagging per-batch replays the same txn_id after a
    crash: the second create must be a recorded no-op, not a conflict."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    s1 = t.create_tag("batch-7", txn_id="tag-batch-7")
    s2 = t.create_tag("batch-7", txn_id="tag-batch-7")  # replay
    assert t.tags() == {"batch-7": 0}
    assert s2 <= s1 or t.latest_snapshot() == s1


def test_restore_via_tag_lookup(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.create_tag("good")
    t.overwrite(_df(spark, [(666, 6.66)]))
    t.restore(t.tags()["good"])
    assert {r.k for r in t.read(spark).collect()} == {1}
    # the tag still resolves after restore (history is append-only)
    assert {r.k for r in t.read(spark, tag="good").collect()} == {1}


def test_vacuum_keep_last_zero_preserves_tag_map(spark, tmp_path):
    """ADVICE r9: vacuum(keep_last=0) on a tagged table must retain the
    LATEST manifest too — the tag map rides the latest manifest, so
    dropping it would make tags() resolve against a pre-tag manifest:
    the tag silently vanishes, the pinned snapshot loses protection on
    the next vacuum, and latest_snapshot() regresses (snapshot-id
    reuse)."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.create_tag("pin")            # tag map now lives in snapshot 1
    t.overwrite(_df(spark, [(2, 2.0)]))
    t.append(_df(spark, [(3, 3.0)]))
    head = t.latest_snapshot()
    t.vacuum(keep_last=0)
    # tag survives, pinned data survives, HEAD does not regress
    assert t.tags() == {"pin": 0}
    assert {r.k for r in t.read(spark, tag="pin").collect()} == {1}
    assert t.latest_snapshot() == head
    assert {r.k for r in t.read(spark).collect()} == {2, 3}
    # second vacuum must be stable (the r9 failure mode was a vanishing
    # tag that unprotected the pin on the NEXT vacuum)
    t.vacuum(keep_last=0)
    assert t.tags() == {"pin": 0}
    assert {r.k for r in t.read(spark, tag="pin").collect()} == {1}
    # new commits get FRESH snapshot ids
    t.append(_df(spark, [(4, 4.0)]))
    assert t.latest_snapshot() > head


def test_timestamp_asof_resolution(spark, tmp_path):
    """TIMESTAMP AS OF: read(asof=ts) resolves the newest snapshot
    committed at or before ts, off the manifest-stamped wall clock."""
    import time as _time

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.append(_df(spark, [(2, 2.0)]))
    t.overwrite(_df(spark, [(9, 9.0)]))
    # recover each commit's stamped time from its own manifest
    stamps = {s: t._manifest(s)["committed_at"] for s in t.snapshots()}
    assert stamps[0] <= stamps[1] <= stamps[2]
    assert t.snapshot_asof(stamps[0]) == 0
    assert t.snapshot_asof((stamps[0] + stamps[1]) / 2) in (0,)
    assert t.snapshot_asof(stamps[1]) == 1
    assert t.snapshot_asof(_time.time() + 60) == 2
    assert {r.k for r in t.read(spark, asof=stamps[1]).collect()} == {1, 2}
    assert {r.k for r in t.read(spark, asof=stamps[2]).collect()} == {9}
    with pytest.raises(SnapshotUnavailable, match="at or before"):
        t.snapshot_asof(stamps[0] - 10)
    with pytest.raises(ValueError, match="not both"):
        t.read(spark, snapshot=0, asof=stamps[0])


def test_timestamp_asof_legacy_manifests_always_eligible(spark, tmp_path):
    """Manifests written before the committed_at field (simulated by
    stripping it) are treated as arbitrarily old, so time travel over a
    table with legacy history still resolves."""
    import json as _json
    import os as _os

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.append(_df(spark, [(2, 2.0)]))
    p0 = _os.path.join(t.log_dir, "0000000000.json")
    m = _json.load(open(p0))
    ts1 = t._manifest(1)["committed_at"]
    del m["committed_at"]
    _os.unlink(p0)
    with open(p0, "w") as f:
        _json.dump(m, f)
    # a ts before snapshot 1's stamp resolves to the legacy snapshot 0
    assert t.snapshot_asof(ts1 - 1e6) == 0
    assert t.snapshot_asof(ts1) == 1


def test_timestamp_asof_vacuum_interplay(spark, tmp_path):
    """TIMESTAMP AS OF × vacuum (VERDICT r10 #8): a timestamp whose
    true as-of manifest was vacuumed fails with a clear error instead
    of silently resolving to an older retained snapshot; a timestamp
    landing on a tagged retention root — before anything dropped after
    it committed — still succeeds."""
    import time as _time

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))     # snapshot 0 (tagged)
    t.append(_df(spark, [(2, 2.0)]))     # snapshot 1 (will be vacuumed)
    t.append(_df(spark, [(3, 3.0)]))     # snapshot 2 (will be vacuumed)
    t.append(_df(spark, [(4, 4.0)]))     # snapshot 3 (latest, retained)
    stamps = {s: t._manifest(s)["committed_at"] for s in t.snapshots()}
    t.create_tag("pin", snapshot=0)      # snapshot 4: the tag commit
    stamp_tag = t._manifest(t.latest_snapshot())["committed_at"]

    dropped, _ = t.vacuum(keep_last=1)
    assert dropped > 0
    assert 1 not in t.snapshots() and 2 not in t.snapshots()

    # ts inside the vacuumed range: the true as-of snapshot (1 or 2)
    # is gone — clear refusal, not a silent resolve-to-0
    with pytest.raises(SnapshotUnavailable, match="vacuumed"):
        t.snapshot_asof(stamps[1])
    with pytest.raises(SnapshotUnavailable, match="vacuumed"):
        t.snapshot_asof((stamps[2] + stamps[3]) / 2)

    # ts exactly on / just after the tagged root but BEFORE the first
    # vacuumed commit: resolution is unambiguous and succeeds
    ok_ts = (stamps[0] + stamps[1]) / 2
    assert t.snapshot_asof(stamps[0]) == 0
    assert t.snapshot_asof(ok_ts) == 0
    assert {r.k for r in t.read(spark, asof=ok_ts).collect()} == {1}

    # keep_last=1 retained only {0 (tag), 4 (latest)}: snapshot 3 was
    # dropped too, so ITS stamp is also refused — only timestamps at or
    # after the retained latest commit resolve forward again
    with pytest.raises(SnapshotUnavailable, match="vacuumed"):
        t.snapshot_asof(stamps[3])
    assert t.snapshot_asof(_time.time() + 60) == 4

    # before everything: unchanged error
    with pytest.raises(SnapshotUnavailable, match="at or before"):
        t.snapshot_asof(stamps[0] - 10)

    # tag read still serviceable after vacuum (retention root)
    assert {r.k for r in t.read(spark, tag="pin").collect()} == {1}
    assert stamp_tag >= stamps[3]


def test_asof_vacuum_gap_survives_second_vacuum(spark, tmp_path):
    """Gap bookkeeping composes across vacuums: when a later vacuum
    drops the anchor snapshot itself, its gap re-attaches to the new
    nearest retained predecessor (conservatively keeping the earliest
    dropped stamp)."""
    t = TxTable(str(tmp_path / "t"))
    for k in range(5):                   # snapshots 0..4
        t.append(_df(spark, [(k, float(k))]))
    stamps = {s: t._manifest(s)["committed_at"] for s in t.snapshots()}
    t.create_tag("root", snapshot=0)     # snapshot 5 (metadata commit)

    # first vacuum keeps {0 (tag), 3, 4, 5}: drops 1, 2 → gap after 0
    t.vacuum(keep_last=3)
    assert t.snapshots()[:2] == [0, 3]
    with pytest.raises(SnapshotUnavailable, match="vacuumed"):
        t.snapshot_asof(stamps[1])

    # second vacuum keeps {0 (tag), 5}: drops 3, 4 → gaps merge on 0
    t.vacuum(keep_last=1)
    assert 3 not in t.snapshots() and 4 not in t.snapshots()
    for s in (1, 2, 3, 4):
        with pytest.raises(SnapshotUnavailable, match="vacuumed"):
            t.snapshot_asof(stamps[s])
    # a ts before the first-ever dropped commit still resolves to 0
    assert t.snapshot_asof((stamps[0] + stamps[1]) / 2) == 0


def test_vacuum_retain_hours_window(spark, tmp_path):
    """Age-based retention (Delta RETAIN n HOURS / Iceberg
    expire_snapshots): snapshots committed inside the window survive a
    keep_last=1 vacuum; rewinding their stamps outside the window makes
    them reclaimable; asof still resolves everything retained."""
    import json as _json
    import os as _os
    import time as _time

    t = TxTable(str(tmp_path / "t"))
    for k in range(4):                      # snapshots 0..3, all "now"
        t.append(_df(spark, [(k, float(k))]))
    dropped, _ = t.vacuum(keep_last=1, retain_hours=1.0)
    assert dropped == 0                     # everything is in-window
    assert t.snapshots() == [0, 1, 2, 3]
    # asof works across the whole retained window
    stamps = {s: t._manifest(s)["committed_at"] for s in t.snapshots()}
    assert t.snapshot_asof(stamps[1]) == 1

    # age snapshots 0..1 out of the window by rewriting their stamps
    for s in (0, 1):
        p = _os.path.join(t.log_dir, f"{s:010d}.json")
        m = _json.load(open(p))
        m["committed_at"] = _time.time() - 7200
        _os.unlink(p)
        with open(p, "w") as f:
            _json.dump(m, f)
    dropped, _ = t.vacuum(keep_last=1, retain_hours=1.0)
    assert dropped == 2
    assert t.snapshots() == [2, 3]
    assert {r.k for r in t.read(spark).collect()} == {0, 1, 2, 3}
    # the expired history refuses asof resolution with the clear error
    with pytest.raises(SnapshotUnavailable):
        t.snapshot_asof(stamps[1])
    assert t.snapshot_asof(stamps[3]) == 3


def test_vacuum_sidecar_corruption_refused(spark, tmp_path):
    """_vacuum.json hardening (ADVICE r11): an ABSENT sidecar means
    'never vacuumed' (no gaps), but an UNPARSEABLE one is corruption
    and must raise — silently mapping it to {} would re-enable the
    exact rewrite-history resolution the gap check prevents. The write
    itself is atomic (temp + os.replace), so no .tmp residue either."""
    import os
    import time as _time

    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    t.append(_df(spark, [(2, 2.0)]))
    t.append(_df(spark, [(3, 3.0)]))
    stamps = {s: t._manifest(s)["committed_at"] for s in t.snapshots()}

    # absent sidecar: time travel works, no gaps assumed
    assert t.snapshot_asof(stamps[1]) == 1

    t.create_tag("pin", snapshot=0)  # retention root anchoring the gap
    t.vacuum(keep_last=1)
    sidecar = os.path.join(t.log_dir, "_vacuum.json")
    assert os.path.exists(sidecar)
    # atomic write left no temp residue
    assert not [n for n in os.listdir(t.log_dir) if ".tmp." in n]
    with pytest.raises(SnapshotUnavailable, match="vacuumed"):
        t.snapshot_asof(stamps[1])

    # truncate the sidecar mid-json: gap checks can no longer be
    # trusted, so resolution REFUSES instead of resolving to snapshot 0
    with open(sidecar) as f:
        body = f.read()
    with open(sidecar, "w") as f:
        f.write(body[: len(body) // 2])
    with pytest.raises(SnapshotUnavailable, match="corrupt vacuum"):
        t.snapshot_asof(stamps[1])
    # even a timestamp that would resolve to the retained latest goes
    # through the gap check and is refused while the sidecar is corrupt
    with pytest.raises(SnapshotUnavailable, match="corrupt vacuum"):
        t.snapshot_asof(_time.time() + 60)
