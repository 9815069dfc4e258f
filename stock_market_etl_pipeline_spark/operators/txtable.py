"""Transaction-log parquet table: atomic multi-file commits, snapshot
reads, time travel, idempotent re-commits, and orphan vacuum — the
metadata layer raw parquet directories lack.

Why this exists at 100 TB: a directory of parquet files has no atomicity
(readers see half-written batches), no isolation (a concurrent overwrite
tears a scan), O(objects) listing cost, and no history. Table formats
(Delta, Iceberg, Hudi) fix all four with ONE idea — readers resolve a
tiny ordered log of manifests instead of listing the filesystem — and
this module is that idea at its minimum viable size, with no external
dependency:

- ``<root>/_log/<n>.json`` — snapshot n's manifest: the COMPLETE list of
  live data files after the commit, plus the action and schema. Readers
  list ``_log`` (KB-scale, bounded by commits, not data) and read
  exactly the named files; data-directory listing never happens.
- Commits are optimistic: stage data files under unique names (invisible
  — no manifest references them), then claim snapshot n+1 by
  exclusive-create of the manifest. A racing writer loses the create and
  gets ``CommitConflict`` — retry on the new snapshot. A crash BEFORE
  the manifest claim leaves only unreferenced staging files: readers are
  untouched and :meth:`TxTable.vacuum` reclaims them. (On object stores
  the exclusive-create maps to conditional PUT / rename-without-
  overwrite; the protocol is unchanged.)
- ``txn_id`` makes re-commits idempotent: foreachBatch gives
  at-least-once delivery, so a replayed micro-batch re-appends with the
  same txn_id and the commit is a recorded no-op — the same
  exactly-once-by-idempotence contract as streaming/ingest.py's
  batch-keyed sink, but without exposing batch_id in the table layout.
- Time travel: ``read(spark, snapshot=k)`` resolves manifest k as long
  as its files haven't been vacuumed — the audit/debug/reproduce-the-
  training-set primitive.

The reference persists via whole-table SQL replace (src/load.py
``to_sql(if_exists=...)``) — implicitly transactional at toy scale; this
is the equivalent guarantee for distributed multi-file writes.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer claimed the target snapshot first — re-read table
    state and retry the commit."""


class SnapshotUnavailable(Exception):
    """The requested snapshot's manifest or data files no longer exist
    (never written, or reclaimed by vacuum)."""


class TxTable:
    def __init__(self, root: str):
        self.root = root
        self.log_dir = os.path.join(root, "_log")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- log resolution (KB-scale metadata reads, never data listing) ---

    def snapshots(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json"):
                try:
                    out.append(int(name[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_snapshot(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _manifest(self, snapshot: int) -> dict:
        path = os.path.join(self.log_dir, f"{snapshot:010d}.json")
        if not os.path.exists(path):
            raise SnapshotUnavailable(f"no manifest for snapshot {snapshot}")
        with open(path) as f:
            return json.load(f)

    # -- commit protocol ------------------------------------------------

    def _stage(self, df: DataFrame) -> tuple[list[str], int]:
        """Write df's files under unique names inside data/. Staged files
        are INVISIBLE until a manifest references them — a crash here
        leaves orphans for vacuum, never a torn table."""
        stage_id = uuid.uuid4().hex
        stage_dir = os.path.join(self.data_dir, f"_stage_{stage_id}")
        df.write.mode("overwrite").parquet(stage_dir)
        files = []
        n_rows = 0
        import pyarrow.parquet as pq

        for name in sorted(os.listdir(stage_dir)):
            if not name.endswith(".parquet"):
                continue
            final = f"{stage_id}_{name}"
            os.rename(
                os.path.join(stage_dir, name),
                os.path.join(self.data_dir, final),
            )
            n_rows += pq.ParquetFile(
                os.path.join(self.data_dir, final)
            ).metadata.num_rows
            files.append(final)
        shutil.rmtree(stage_dir)
        return files, n_rows

    def _commit(
        self,
        action: str,
        new_files: list[str],
        n_rows: int,
        schema: str,
        txn_id: str | None,
        keep_previous: bool,
        base: int | None = None,
    ) -> int:
        """Claim snapshot ``base + 1``. ``base`` is the table state the
        writer READ when it started (captured before staging); if a racer
        committed meanwhile, the exclusive create below fails and the
        caller gets CommitConflict instead of a silent rebase onto files
        it never saw."""
        prev = self.latest_snapshot() if base is None else base
        if txn_id is not None and prev is not None:
            seen = set()
            for s in self.snapshots():
                t = self._manifest(s).get("txn_id")
                if t:
                    seen.add(t)
            if txn_id in seen:
                # replayed delivery: the work is already committed.
                # Staged files become orphans; vacuum reclaims them.
                return prev
        live = []
        if keep_previous and prev is not None:
            live = list(self._manifest(prev)["files"])
            prev_schema = self._manifest(prev)["schema"]
            if prev_schema != schema:
                raise ValueError(
                    f"append schema mismatch: table has {prev_schema}, "
                    f"commit brings {schema}"
                )
        manifest = {
            "snapshot": (prev + 1) if prev is not None else 0,
            "action": action,
            "files": live + new_files,
            "added": new_files,
            "n_rows_added": n_rows,
            "schema": schema,
            "txn_id": txn_id,
        }
        path = os.path.join(self.log_dir, f"{manifest['snapshot']:010d}.json")
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            # exclusive-create claims the snapshot number atomically;
            # os.link fails with EEXIST if a racer won (POSIX rename
            # would silently overwrite — exactly the wrong semantics).
            os.link(tmp, path)
        except FileExistsError as e:
            raise CommitConflict(
                f"snapshot {manifest['snapshot']} already committed"
            ) from e
        finally:
            os.unlink(tmp)
        return manifest["snapshot"]

    def append(self, df: DataFrame, txn_id: str | None = None) -> int:
        """Atomically add df's rows. Returns the committed snapshot id.
        With txn_id, a replayed append of the same transaction is a
        no-op (exactly-once under at-least-once delivery). Raises
        CommitConflict if another writer committed since this call began
        — retry by calling append again (it re-reads table state)."""
        base = self.latest_snapshot()
        files, n = self._stage(df)
        return self._commit(
            "append", files, n, df.schema.simpleString(), txn_id, True,
            base=base,
        )

    def overwrite(self, df: DataFrame, txn_id: str | None = None) -> int:
        """Atomically replace the table's contents. Prior snapshots stay
        readable (their files are not touched) until vacuum. Conflict
        semantics as in append."""
        base = self.latest_snapshot()
        files, n = self._stage(df)
        return self._commit(
            "overwrite", files, n, df.schema.simpleString(), txn_id, False,
            base=base,
        )

    # -- reads ----------------------------------------------------------

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        """Resolve a manifest and read EXACTLY its file list — snapshot
        isolation by construction: concurrent commits change the log, not
        the files this reader was handed."""
        snap = self.latest_snapshot() if snapshot is None else snapshot
        if snap is None:
            raise SnapshotUnavailable("table has no commits")
        m = self._manifest(snap)
        paths = [os.path.join(self.data_dir, f) for f in m["files"]]
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            raise SnapshotUnavailable(
                f"snapshot {snap}: {len(missing)} data files vacuumed"
            )
        if not paths:
            return spark.read.schema(m["schema"]).parquet(
                os.path.join(self.data_dir, "_empty_nonexistent")
            ).limit(0)
        return spark.read.parquet(*paths)

    # -- maintenance ----------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> tuple[int, int]:
        """Reclaim space: drop manifests older than the newest
        ``keep_last`` and delete data files no retained manifest
        references — which also sweeps crash orphans (staged files never
        claimed by any commit). Returns (manifests_dropped,
        files_deleted). The retained history bounds time travel."""
        snaps = self.snapshots()
        if not snaps:
            # no commits: everything in data/ is an orphan
            orphans = [
                n for n in os.listdir(self.data_dir) if n.endswith(".parquet")
            ]
            for n in orphans:
                os.unlink(os.path.join(self.data_dir, n))
            for n in os.listdir(self.data_dir):
                full = os.path.join(self.data_dir, n)
                if os.path.isdir(full) and n.startswith("_stage_"):
                    shutil.rmtree(full)
            return 0, len(orphans)
        retained = snaps[-keep_last:] if keep_last > 0 else []
        keep_files: set[str] = set()
        for s in retained:
            keep_files.update(self._manifest(s)["files"])
        dropped = 0
        for s in snaps:
            if s not in retained:
                os.unlink(os.path.join(self.log_dir, f"{s:010d}.json"))
                dropped += 1
        deleted = 0
        for name in list(os.listdir(self.data_dir)):
            full = os.path.join(self.data_dir, name)
            if os.path.isdir(full):
                if name.startswith("_stage_"):
                    shutil.rmtree(full)
                continue
            if name.endswith(".parquet") and name not in keep_files:
                os.unlink(full)
                deleted += 1
        return dropped, deleted

    def history(self) -> list[dict]:
        """The commit log as data: (snapshot, action, files added, rows
        added, txn_id) per commit — the audit trail a lineage system
        reads."""
        return [
            {
                k: m[k]
                for k in ("snapshot", "action", "n_rows_added", "txn_id")
            }
            | {"n_files_added": len(m["added"]), "n_files_live": len(m["files"])}
            for m in (self._manifest(s) for s in self.snapshots())
        ]
