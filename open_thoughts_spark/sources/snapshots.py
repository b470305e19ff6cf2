"""Snapshot-versioned table writes — the Iceberg-shaped metadata layer.

The reference's resumability hangs on operator-config hashes mapped to
cached outputs (engine/dag.py:111-121 ancestor hashing; GCS cache sync in
engine/data_syncer.py); on a real deployment this engine writes Iceberg
tables and gets snapshots/time-travel from the catalog. Neither Iceberg nor
a metastore exists in this sandbox, so this module implements the SAME
metadata contract over plain parquet + JSON manifests:

- every write creates an immutable ``snap-<id>`` data directory plus a
  manifest recording parent snapshot, operation, file list, row count and
  schema — appends REUSE the parent's files by reference (no rewrite),
  exactly like Iceberg manifests;
- reads resolve a snapshot (default: current) to its file list and load
  only those files — time travel is reading an older snapshot id;
- rollback just repoints ``current`` at an earlier snapshot (no data is
  deleted — the same O(1) metadata operation as ``ALTER TABLE ... ROLLBACK``).

At 100 TB the mechanism is unchanged: manifests stay tiny (file paths +
stats), appends never rewrite data, and old snapshots age out via
``expire_snapshots`` (keep-last-N retention that never deletes a data
directory a surviving snapshot still references).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _file_column_stats(files: list[str]) -> dict[str, dict[str, list]]:
    """{file: {col: [min, max]}} from parquet footers — metadata-only reads
    (a few KB per file, no row data), the same stats an Iceberg writer
    records at commit time. Only JSON-safe scalar types (int/float/str)
    are kept; anything else (binary, timestamps, missing stats) is
    omitted so pruning stays conservative."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # stats become empty -> read() keeps every file
        return {}
    out: dict[str, dict[str, list]] = {}
    for path in files:
        meta = pq.ParquetFile(path).metadata
        cols: dict[str, list] = {}
        for ci in range(len(meta.schema)):
            name = meta.schema.column(ci).name
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mins = []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins and all(
                isinstance(v, (int, float, str)) and not isinstance(v, bool)
                for v in (min(mins), max(maxs))
            ):
                cols[name] = [min(mins), max(maxs)]
        if cols:
            out[path] = cols
    return out


def _bounds_may_match(bounds: list | None, op: str, value) -> bool:
    """Interval test: can a file with [lo, hi] contain a row matching
    ``col op value``? Unknown bounds -> True (never prune blindly)."""
    if bounds is None:
        return True
    lo, hi = bounds
    if op in ("<", "<="):
        return lo < value if op == "<" else lo <= value
    if op in (">", ">="):
        return hi > value if op == ">" else hi >= value
    if op in ("==", "="):
        return lo <= value <= hi
    raise ValueError(f"unsupported pruning op: {op}")


def _predicate(col: str, op: str, value):
    c = F.col(col)
    return {
        "<": c < value,
        "<=": c <= value,
        ">": c > value,
        ">=": c >= value,
        "==": c == value,
        "=": c == value,
    }[op]


class SnapshotCatalog:
    """Filesystem-backed snapshot catalog: ``base/<table>/manifests/*.json``
    + ``base/<table>/data/snap-<id>/part-*.parquet``."""

    def __init__(self, base_path: str):
        self.base = base_path

    # --- paths ---

    def _tdir(self, table: str) -> str:
        return os.path.join(self.base, table)

    def _manifest_path(self, table: str, snap_id: str) -> str:
        return os.path.join(self._tdir(table), "manifests", f"{snap_id}.json")

    def _current_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifests", "current")

    # --- metadata ---

    def current_snapshot(self, table: str) -> str | None:
        p = self._current_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def manifest(self, table: str, snap_id: str) -> dict:
        with open(self._manifest_path(table, snap_id)) as f:
            return json.load(f)

    def has_snapshot(
        self, table: str, snap_id: str, verify_data: bool = True
    ) -> bool:
        """True when ``snap_id`` is a readable snapshot of ``table``.

        ``verify_data`` also checks every data file the manifest references
        still exists (a manifest can outlive its files after an external
        cleanup) — the check resume paths should use before trusting a
        cache hit.
        """
        try:
            m = self.manifest(table, snap_id)
        except (FileNotFoundError, json.JSONDecodeError):
            return False
        if verify_data:
            return all(os.path.exists(f) for f in m.get("files", []))
        return True

    def history(self, table: str) -> list[dict]:
        """Manifest chain, newest first, from the current snapshot. A
        missing parent manifest (crash-lost or expired outside the sweep)
        ends the walk instead of raising — the same truncation Iceberg
        shows after snapshot expiry."""
        out = []
        snap = self.current_snapshot(table)
        while snap:
            try:
                m = self.manifest(table, snap)
            except FileNotFoundError:
                break
            out.append(m)
            snap = m.get("parent")
        return out

    # --- write / read / rollback ---

    def write(
        self, df: DataFrame, table: str, mode: str = "append"
    ) -> str:
        """Write a new snapshot; returns its id. ``append`` carries the
        parent's file list forward by reference; ``overwrite`` starts a
        fresh file list (old files stay on disk for time travel)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown snapshot mode: {mode}")
        lock = self._acquire_commit_lock(table)
        try:
            return self._write_locked(df, table, mode)
        finally:
            self._release_commit_lock(lock)

    def append_batch(
        self, df: DataFrame, table: str, batch_id: int
    ) -> str | None:
        """Idempotent streaming append: commit micro-batch ``batch_id`` as
        an append snapshot, or SKIP it (returning None) if a snapshot on
        the current chain already committed this batch — the exactly-once
        contract Structured Streaming expects of a sink (after a failure
        the engine replays the last batch; a second commit would double
        its rows). The committed batch id rides in the manifest and is
        inherited forward, so the check is one manifest read under the
        commit lock — the Iceberg streaming-commit mechanism in miniature.
        """
        lock = self._acquire_commit_lock(table)
        try:
            parent = self.current_snapshot(table)
            if parent is not None:
                last = self.manifest(table, parent).get("stream_batch_id")
                if last is not None and batch_id <= last:
                    return None
            mode = "append" if parent else "overwrite"
            return self._write_locked(df, table, mode, batch_id=batch_id)
        finally:
            self._release_commit_lock(lock)

    def foreach_batch_appender(self, table: str):
        """``writeStream.foreachBatch`` adapter for :meth:`append_batch`:
        ``stream.writeStream.foreachBatch(cat.foreach_batch_appender("t"))``
        gives a snapshot-versioned, replay-safe streaming sink."""

        def _append(df: DataFrame, batch_id: int) -> None:
            self.append_batch(df, table, batch_id)

        return _append

    def delete_where(
        self, spark: SparkSession, table: str, where: tuple | list
    ) -> str:
        """Copy-on-write DELETE: remove every row matching ``where`` (one
        ``(col, op, value)`` tuple or an AND list) in a NEW snapshot that
        rewrites ONLY the files whose manifest bounds overlap the
        predicate — every other file carries forward by reference, and the
        parent snapshot still time-travels to the pre-delete data.

        This is the Iceberg/Delta copy-on-write mechanism, and the curated-
        corpus use case is exactly why it matters at 100 TB: purging a
        contaminated id range (or a PII-flagged slice) from a petabyte
        table must not rewrite the petabyte — with a clustered layout the
        predicate bounds a handful of files and only those are rewritten.
        Returns the new snapshot id (the current snapshot unchanged if no
        file can contain a match — a metadata-only no-op).
        """
        preds = [where] if isinstance(where, tuple) else list(where)
        lock = self._acquire_commit_lock(table)
        try:
            parent = self.current_snapshot(table)
            if parent is None:
                raise ValueError(f"table has no snapshots: {table}")
            pm = self.manifest(table, parent)
            stats = pm.get("stats", {})
            touched = [
                f
                for f in pm["files"]
                if all(
                    _bounds_may_match(stats.get(f, {}).get(col), op, value)
                    for col, op, value in preds
                )
            ]
            if not touched:
                return parent
            to_delete = F.lit(True)
            for col, op, value in preds:
                to_delete = to_delete & _predicate(col, op, value)
            # DELETE semantics: remove rows where the predicate is TRUE;
            # rows where it evaluates to SQL NULL survive. A bare
            # ``~to_delete`` is NULL for those rows and filter() drops
            # them — data loss that would depend on which files the stats
            # happened to touch (ADVICE r5 #1).
            remaining = spark.read.parquet(*touched).filter(
                ~F.coalesce(to_delete, F.lit(False))
            )

            ts = int(time.time() * 1000)
            snap_id = hashlib.md5(
                f"{table}|{parent}|{ts}|delete|{preds!r}".encode()
            ).hexdigest()[:16]
            data_dir = os.path.join(self._tdir(table), "data", f"snap-{snap_id}")
            remaining.write.mode("errorifexists").parquet(data_dir)
            new_files = sorted(
                os.path.join(data_dir, fn)
                for fn in os.listdir(data_dir)
                if fn.endswith(".parquet")
            )
            kept = [f for f in pm["files"] if f not in set(touched)]
            manifest = {
                "snapshot_id": snap_id,
                "parent": parent,
                "ts_ms": ts,
                "operation": "delete",
                # maintenance ops between micro-batches must not reset the
                # exactly-once check (ADVICE r5 #2): inherit the last
                # committed stream batch id like append snapshots do
                "stream_batch_id": pm.get("stream_batch_id"),
                "files": kept + new_files,
                "new_files": new_files,
                "rewritten_files": touched,
                "schema": pm.get("schema"),
                "stats": {
                    **{f: stats[f] for f in kept if f in stats},
                    **_file_column_stats(new_files),
                },
            }
            with open(self._manifest_path(table, snap_id), "w") as f:
                json.dump(manifest, f, indent=1)
            self._write_current(table, snap_id)
            return snap_id
        finally:
            self._release_commit_lock(lock)

    def merge_rows(
        self, spark: SparkSession, table: str, df: DataFrame, key_col: str
    ) -> str:
        """Copy-on-write MERGE (upsert by key): every row of ``df`` replaces
        the table's same-key row, or inserts if the key is new — in ONE new
        snapshot that rewrites only the files whose ``key_col`` bounds
        overlap the incoming keys' [min, max]; all other files carry
        forward by reference, and the parent snapshot still time-travels.

        The re-scored-slice case: re-running the quality filter over one
        day's conversations must not rewrite the table — with the output
        clustered on the key, the incoming key range bounds a few files.
        Files with unknown bounds are conservatively rewritten. The anti-
        join that drops superseded rows broadcasts the incoming keys (the
        upsert slice is small by construction; AQE decides otherwise).
        A far-away insert key widens [min, max] and with it the rewrite —
        append pure inserts with ``write(mode="append")`` and merge only
        the updates, or merge per key-locality slice.
        """
        lock = self._acquire_commit_lock(table)
        try:
            parent = self.current_snapshot(table)
            if parent is None:
                raise ValueError(f"table has no snapshots: {table}")
            pm = self.manifest(table, parent)
            stats = pm.get("stats", {})
            krange = df.agg(
                F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
            ).collect()[0]
            if krange["lo"] is None:
                return parent  # empty upsert: metadata no-op
            # an upsert slice with repeated keys would insert every copy
            # (the anti-join only removes TABLE rows) and silently leave
            # duplicate-key rows in the new snapshot (ADVICE r5 #5)
            dup = (
                df.groupBy(key_col).count().filter(F.col("count") > 1)
                .limit(1).count()
            )
            if dup:
                raise ValueError(
                    f"merge_rows: incoming frame has duplicate {key_col} "
                    "values; dropDuplicates to a last-wins slice first"
                )
            touched = [
                f
                for f in pm["files"]
                if _bounds_may_match(stats.get(f, {}).get(key_col), ">=", krange["lo"])
                and _bounds_may_match(stats.get(f, {}).get(key_col), "<=", krange["hi"])
            ]
            keys = df.select(key_col)
            if touched:
                remaining = spark.read.parquet(*touched).join(
                    keys, on=key_col, how="left_anti"
                )
                out = remaining.unionByName(df)
            else:
                out = df

            ts = int(time.time() * 1000)
            snap_id = hashlib.md5(
                f"{table}|{parent}|{ts}|merge|{key_col}".encode()
            ).hexdigest()[:16]
            data_dir = os.path.join(self._tdir(table), "data", f"snap-{snap_id}")
            out.write.mode("errorifexists").parquet(data_dir)
            new_files = sorted(
                os.path.join(data_dir, fn)
                for fn in os.listdir(data_dir)
                if fn.endswith(".parquet")
            )
            kept = [f for f in pm["files"] if f not in set(touched)]
            manifest = {
                "snapshot_id": snap_id,
                "parent": parent,
                "ts_ms": ts,
                "operation": "merge",
                "stream_batch_id": pm.get("stream_batch_id"),  # ADVICE r5 #2
                "files": kept + new_files,
                "new_files": new_files,
                "rewritten_files": touched,
                "schema": pm.get("schema"),
                "stats": {
                    **{f: stats[f] for f in kept if f in stats},
                    **_file_column_stats(new_files),
                },
            }
            with open(self._manifest_path(table, snap_id), "w") as f:
                json.dump(manifest, f, indent=1)
            self._write_current(table, snap_id)
            return snap_id
        finally:
            self._release_commit_lock(lock)

    def _acquire_commit_lock(self, table: str, timeout_s: float = 60.0) -> str:
        """Single-writer commit section (a real catalog does an atomic
        swap with conflict retry; on a plain filesystem an O_EXCL lock
        file is the portable equivalent). Without it two concurrent
        appends both read the same parent and the later current-pointer
        write silently drops the other's files."""
        path = os.path.join(self._tdir(table), "manifests", ".commit.lock")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        deadline = time.time() + timeout_s
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return path
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(f"commit lock busy: {path}")
                time.sleep(0.05)

    def _release_commit_lock(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def _write_locked(
        self, df: DataFrame, table: str, mode: str, batch_id: int | None = None
    ) -> str:
        parent = self.current_snapshot(table)
        ts = int(time.time() * 1000)
        snap_id = hashlib.md5(
            f"{table}|{parent}|{ts}|{df.schema.simpleString()}".encode()
        ).hexdigest()[:16]
        data_dir = os.path.join(self._tdir(table), "data", f"snap-{snap_id}")
        df.write.mode("errorifexists").parquet(data_dir)
        new_files = sorted(
            os.path.join(data_dir, fn)
            for fn in os.listdir(data_dir)
            if fn.endswith(".parquet")
        )
        files = list(new_files)
        stats = _file_column_stats(new_files)
        last_batch = None
        if mode == "append" and parent:
            pm = self.manifest(table, parent)
            files = pm["files"] + files
            stats = {**pm.get("stats", {}), **stats}
            last_batch = pm.get("stream_batch_id")
        manifest = {
            "snapshot_id": snap_id,
            "parent": parent,
            "ts_ms": ts,
            "operation": mode,
            "files": files,
            "new_files": new_files,
            "schema": df.schema.simpleString(),
            # Iceberg manifests carry per-file column bounds for scan
            # pruning; same contract here (parquet footer min/max, JSON-
            # safe types only)
            "stats": stats,
            # highest committed streaming micro-batch, inherited forward
            # (append_batch's exactly-once dedup check)
            "stream_batch_id": batch_id if batch_id is not None else last_batch,
        }
        os.makedirs(os.path.dirname(self._manifest_path(table, snap_id)), exist_ok=True)
        with open(self._manifest_path(table, snap_id), "w") as f:
            json.dump(manifest, f, indent=1)
        self._write_current(table, snap_id)
        return snap_id

    def _write_current(self, table: str, snap_id: str) -> None:
        """Atomic current-pointer update (tmp + os.replace): a crash
        mid-write must never leave a truncated pointer a concurrent
        reader could see."""
        tmp = self._current_path(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap_id)
        os.replace(tmp, self._current_path(table))

    def snapshots_df(self, spark: SparkSession, table: str) -> DataFrame:
        """The table's snapshot history as a queryable DataFrame — the
        Iceberg ``table.snapshots`` metadata-table analog: one row per
        snapshot on the current chain (newest first by ``ts_ms``) with
        operation, parent, file/new-file counts, and byte sizes (files
        that expired off disk count 0 bytes). Audit surface for retention
        and rollback decisions."""
        rows = []
        for m in self.history(table):
            rows.append(
                (
                    m["snapshot_id"],
                    m.get("parent"),
                    int(m["ts_ms"]),
                    m.get("operation"),
                    len(m["files"]),
                    len(m.get("new_files", [])),
                    sum(
                        os.path.getsize(f)
                        for f in m["files"]
                        if os.path.exists(f)
                    ),
                )
            )
        return spark.createDataFrame(
            rows,
            "snapshot_id string, parent string, ts_ms long, operation string, "
            "n_files int, n_new_files int, total_bytes long",
        )

    def read(
        self,
        spark: SparkSession,
        table: str,
        snapshot_id: str | None = None,
        where: tuple | None = None,
    ) -> DataFrame:
        """Read the table at ``snapshot_id`` (default: current) — time
        travel is passing an older id.

        ``where`` is one ``(col, op, value)`` tuple or a list of them
        (AND-combined), op in <, <=, >, >=, ==. Each predicate prunes the
        file list against the manifest's per-file column bounds BEFORE
        Spark ever lists them (Iceberg metadata pruning: a planner-side
        interval test over the manifest, no footer reads, no tasks), then
        the same predicates filter the surviving files — so the result
        equals an unpruned filtered read, but selective predicates over a
        clustered/z-ordered layout open a fraction of the files (a z
        layout makes SEVERAL columns' bounds tight at once — this is its
        consumer). Files with no recorded bounds for a column are
        conservatively kept.
        """
        snap = snapshot_id or self.current_snapshot(table)
        if snap is None:
            raise ValueError(f"table has no snapshots: {table}")
        m = self.manifest(table, snap)
        files = m["files"]
        if not files:
            raise ValueError(f"snapshot {snap} has no data files")
        if where is None:
            return spark.read.parquet(*files)
        preds = [where] if isinstance(where, tuple) else list(where)
        stats = m.get("stats", {})
        kept = [
            f
            for f in files
            if all(
                _bounds_may_match(stats.get(f, {}).get(col), op, value)
                for col, op, value in preds
            )
        ]
        if not kept:
            # predicates exclude every file: an empty frame with the full
            # schema (read one file's schema, filter to nothing)
            return spark.read.parquet(files[0]).filter(F.lit(False))
        out = spark.read.parquet(*kept)
        for col, op, value in preds:
            out = out.filter(_predicate(col, op, value))
        return out

    def rollback(self, table: str, snapshot_id: str) -> None:
        """Repoint current at an earlier snapshot (metadata-only).

        Runs inside the commit lock with an atomic pointer swap (ADVICE
        r3): a plain open/write could be interleaved with a concurrent
        ``write()``'s parent read, or crash mid-write leaving a truncated
        pointer."""
        if not os.path.exists(self._manifest_path(table, snapshot_id)):
            raise ValueError(f"unknown snapshot: {snapshot_id}")
        lock = self._acquire_commit_lock(table)
        try:
            self._write_current(table, snapshot_id)
        finally:
            self._release_commit_lock(lock)

    def expire_snapshots(self, table: str, keep_last: int = 3) -> list[str]:
        """Retention sweep: keep the newest ``keep_last`` snapshots of the
        current history chain, delete older manifests plus any data
        directory no surviving snapshot references. Returns the expired
        snapshot ids. Metadata-only removal of history — files referenced
        by a surviving snapshot (appends share parents' files) are kept.

        Takes the commit lock (ADVICE r3): a sweep racing a concurrent
        append could delete a data directory the in-flight manifest is
        about to reference."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        lock = self._acquire_commit_lock(table)
        try:
            return self._expire_locked(table, keep_last)
        finally:
            self._release_commit_lock(lock)

    def _expire_locked(self, table: str, keep_last: int) -> list[str]:
        import shutil

        chain = self.history(table)
        keep, expire = chain[:keep_last], chain[keep_last:]
        keep_files = {f for m in keep for f in m["files"]}
        # also keep anything referenced by snapshots OFF the current chain
        # (e.g. a rolled-back-past branch) — walk every manifest on disk
        mdir = os.path.join(self._tdir(table), "manifests")
        expired_ids = {m["snapshot_id"] for m in expire}
        survivors = []
        for fn in os.listdir(mdir):
            if not fn.endswith(".json"):
                continue
            sid = fn[:-5]
            if sid in expired_ids:
                continue
            m = self.manifest(table, sid)
            survivors.append(m)
            keep_files.update(m["files"])
        removed = []
        for m in expire:
            for d in {os.path.dirname(f) for f in m["new_files"]}:
                if not any(f.startswith(d + os.sep) for f in keep_files):
                    shutil.rmtree(d, ignore_errors=True)
            os.remove(self._manifest_path(table, m["snapshot_id"]))
            removed.append(m["snapshot_id"])
        # EVERY surviving manifest whose parent was expired gets its
        # pointer cleared — including off-chain branches left by rollback
        # (a dangling parent would poison history() with FileNotFoundError)
        for m in survivors:
            if m.get("parent") in expired_ids:
                mp = self._manifest_path(table, m["snapshot_id"])
                with open(mp + ".tmp", "w") as f:
                    json.dump(dict(m, parent=None), f, indent=1)
                os.replace(mp + ".tmp", mp)
        return removed
