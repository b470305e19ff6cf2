"""Stage-hash checkpoint manifest — resumable pipelines.

The reference's headline infrastructure feature is a content-addressed
operator cache: each operator's cache key is a hash over the ordered configs
of all its ancestors (function-typed fields hashed by transitively gathered
source), and execution skips any operator whose output directory carries a
SUCCESS flag (/root/reference/open_thoughts_3/engine/dag.py:111-171,
dcft/data_strategies/synthetic_data_manager.py:303-371, 518-521,
hashing_utils.py:188-262).

Spark-native re-expression: a pipeline is an ordered list of named stages
(DataFrame → DataFrame). Each stage's hash = sha256(stage name + stage config
+ upstream hash). A manifest JSON maps stage hash → snapshot path; a stage
whose hash is present with a ``_SUCCESS`` marker is *read back* instead of
recomputed, so a crashed 10^12-turn run resumes from the last durable stage.

On an Iceberg deployment the snapshot path becomes an Iceberg snapshot id /
branch (``df.writeTo(table).createOrReplace()`` + snapshot metadata); the
manifest logic is identical — parquet dirs stand in for snapshots in this
sandbox (no Iceberg jars are available offline).

Catalog mode (VERDICT r3 #3): pass a ``SnapshotCatalog`` + table name and
stage boundaries commit THROUGH the catalog instead of raw parquet dirs —
the manifest maps stage hash -> snapshot id, resume is a catalog
time-travel read, and ``rollback_to`` repoints the catalog at an earlier
stage's snapshot while invalidating every downstream stage hash, so the
next ``run`` recomputes exactly the rolled-back-past suffix. One
mechanism, not two parallel ones.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

#: Schema of the queryable per-stage run-lineage table (``lineage_df``).
#: Parity: the reference records one Postgres ``datasets`` row per operator
#: run — op hash, YAML, timing, status, row count
#: (synthetic_data_manager.py:794-1056, database/models.py:21-149). Here
#: the row is appended per stage per ``run()`` to a JSONL log next to the
#: manifest; counts are integer-space so the table value-oracles.
LINEAGE_SCHEMA = (
    "run_id string, run_seq int, seq int, stage string, stage_hash string, "
    "action string, snapshot_id string, path string, input_rows long, "
    "output_rows long, output_bytes long, wall_ms long, "
    "input_fingerprint string, config string, ts_ms long"
)


def _stable_json(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), default=str)


def stage_hash(name: str, config: dict, upstream: str) -> str:
    """sha256 over (name, config, upstream-hash) — the ancestor-chain hash
    (dag.py:111-121 semantics: a stage's key covers everything above it)."""
    payload = _stable_json({"name": name, "config": config, "upstream": upstream})
    return hashlib.sha256(payload.encode()).hexdigest()[:20]


def semantics_digest(*parts) -> str:
    """Content-addressed stage fingerprint: sha256 over the source text of
    any modules passed plus the stable-JSON of any other values (threshold
    dicts, rule orders, regex tables). Folding this into ``Stage.config``
    means editing rule code or a governing constant invalidates the chain
    automatically — the reference hashes function source transitively
    (hashing_utils.py:188-262); hand-bumped 'v1' strings silently resumed
    stale snapshots (ADVICE r1)."""
    import inspect
    import types

    h = hashlib.sha256()
    for p in parts:
        if isinstance(p, types.ModuleType):
            h.update(inspect.getsource(p).encode())
        else:
            h.update(_stable_json(p).encode())
    return h.hexdigest()[:16]


@dataclass
class Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    config: dict = field(default_factory=dict)


class CheckpointedPipeline:
    """Run stages with snapshot-or-recompute semantics.

    >>> pipe = CheckpointedPipeline(spark, "/ckpt/dir", [Stage("scrub", f)])
    >>> out = pipe.run(input_df, input_fingerprint="v1")

    ``input_fingerprint`` seeds the hash chain (e.g. source table snapshot id
    / path + version); change it and every stage recomputes.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        stages: list[Stage],
        snapshot_every: int = 1,
        catalog=None,
        table: str | None = None,
    ):
        self.spark = spark
        self.dir = checkpoint_dir
        self.stages = stages
        self.snapshot_every = max(snapshot_every, 1)
        if catalog is not None and not table:
            raise ValueError("catalog mode needs a table name")
        self.catalog = catalog
        self.table = table
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._manifest_path = os.path.join(checkpoint_dir, "manifest.json")
        self._lineage_path = os.path.join(checkpoint_dir, "lineage.jsonl")
        self.manifest: dict = self._load_manifest()
        self.events: list[dict] = []  # audit of hit/miss per run
        self._run_count = 0

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"stages": {}}

    def _save_manifest(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def _snapshot_ok(self, h: str) -> bool:
        entry = self.manifest["stages"].get(h)
        if not entry:
            return False
        if "snapshot_id" in entry:
            # a catalog-mode entry is only resumable when THIS pipeline has
            # the catalog; without it, recompute instead of AttributeError
            # (code-review r4: use_catalog=False over a catalog manifest)
            return self.catalog is not None and self.catalog.has_snapshot(
                self.table, entry["snapshot_id"]
            )
        return os.path.exists(os.path.join(entry["path"], "_SUCCESS"))

    def _commit_boundary(self, df: DataFrame, stage: Stage, h: str) -> DataFrame:
        """Materialize one boundary: catalog snapshot (overwrite commit —
        the parent chain keeps earlier stages time-travelable) or a raw
        parquet dir, then read it back so downstream stages consume the
        durable copy."""
        if self.catalog is not None:
            snap_id = self.catalog.write(df, self.table, mode="overwrite")
            self.manifest["stages"][h] = {
                "stage": stage.name,
                "snapshot_id": snap_id,
            }
            self._save_manifest()
            return self.catalog.read(self.spark, self.table, snap_id)
        path = os.path.join(self.dir, f"{stage.name}-{h}")
        df.write.mode("overwrite").parquet(path)
        self.manifest["stages"][h] = {
            "stage": stage.name,
            "path": path,
            "upstream": True,
        }
        self._save_manifest()
        return self.spark.read.parquet(path)

    def _read_boundary(self, h: str) -> DataFrame:
        entry = self.manifest["stages"][h]
        if "snapshot_id" in entry:
            return self.catalog.read(self.spark, self.table, entry["snapshot_id"])
        return self.spark.read.parquet(entry["path"])

    def chain_hashes(self, input_fingerprint: str) -> list[tuple[str, Stage]]:
        """The (hash, stage) chain this input would produce — the same
        derivation ``run`` uses, exposed for lineage and rollback."""
        out = []
        upstream = input_fingerprint
        for stage in self.stages:
            h = stage_hash(stage.name, stage.config, upstream)
            out.append((h, stage))
            upstream = h
        return out

    def lineage(self, input_fingerprint: str) -> list[dict]:
        """Stage lineage table: name, hash, and the snapshot id / path the
        manifest currently maps it to (None = not materialized)."""
        rows = []
        for h, stage in self.chain_hashes(input_fingerprint):
            entry = self.manifest["stages"].get(h, {})
            rows.append(
                {
                    "stage": stage.name,
                    "hash": h,
                    "snapshot_id": entry.get("snapshot_id"),
                    "path": entry.get("path"),
                }
            )
        return rows

    def rollback_to(self, stage_name: str, input_fingerprint: str) -> str:
        """Repoint the catalog at ``stage_name``'s snapshot and invalidate
        every downstream stage hash, so the next ``run`` resumes at the
        target and recomputes only the suffix (the reference contract:
        rollback = metadata repoint + cache invalidation below it).
        Returns the snapshot id rolled back to."""
        if self.catalog is None:
            raise ValueError("rollback_to requires catalog mode")
        chain = self.chain_hashes(input_fingerprint)
        names = [s.name for _, s in chain]
        if stage_name not in names:
            raise ValueError(f"unknown stage: {stage_name}")
        idx = names.index(stage_name)
        target_h = chain[idx][0]
        entry = self.manifest["stages"].get(target_h)
        if not entry or "snapshot_id" not in entry:
            raise ValueError(f"stage {stage_name} has no committed snapshot")
        self.catalog.rollback(self.table, entry["snapshot_id"])
        for h, _ in chain[idx + 1:]:
            self.manifest["stages"].pop(h, None)
        self._save_manifest()
        return entry["snapshot_id"]

    def run(self, df: DataFrame, input_fingerprint: str) -> DataFrame:
        """Execute the chain, reading back any stage whose snapshot exists.

        Only stages at ``snapshot_every`` boundaries (and the final stage)
        are materialized — intermediate stages stay lazy, so checkpointing
        costs one parquet write per boundary, not per stage.

        Every stage appends a lineage row (``LINEAGE_SCHEMA``) to
        ``lineage.jsonl``: action, snapshot id, input/output row counts at
        materialization boundaries (a count on freshly written parquet is
        metadata-cheap), and per-boundary wall time. Lazy (non-boundary)
        stages record null rows/wall — they were never materialized, so any
        number there would be an extra full computation, not an audit.
        """
        upstream = input_fingerprint
        self.events = []
        if self._run_count == 0 and os.path.exists(self._lineage_path):
            # a fresh process over an existing log continues the run
            # numbering instead of restarting at 1 (distinct run ids seen)
            with open(self._lineage_path) as f:
                self._run_count = len(
                    {json.loads(ln)["run_id"] for ln in f if ln.strip()}
                )
        self._run_count += 1
        run_id = uuid.uuid4().hex[:12]
        rows_in: int | None = None  # last materialized boundary's count
        pending: list[tuple[str, Stage]] = []
        for i, stage in enumerate(self.stages):
            h = stage_hash(stage.name, stage.config, upstream)
            upstream = h
            is_boundary = ((i + 1) % self.snapshot_every == 0) or (
                i == len(self.stages) - 1
            )
            if is_boundary and self._snapshot_ok(h):
                # resume: drop everything queued, read the snapshot
                t0 = time.time()
                df = self._read_boundary(h)
                out_rows = df.count()
                pending = []
                self.events.append(
                    {
                        "stage": stage.name,
                        "hash": h,
                        "action": "resumed",
                        "snapshot_id": self.manifest["stages"][h].get(
                            "snapshot_id"
                        ),
                        "seq": i,
                        "input_rows": None,  # upstream never ran this run
                        "output_rows": out_rows,
                        "output_bytes": self._boundary_bytes(h),
                        "wall_ms": int((time.time() - t0) * 1000),
                    }
                )
                rows_in = out_rows
                continue
            pending.append((h, stage))
            if not is_boundary:
                continue
            t0 = time.time()
            group_input_rows = rows_in
            for j, (ph, pstage) in enumerate(pending):
                df = pstage.fn(df)
                self.events.append(
                    {
                        "stage": pstage.name,
                        "hash": ph,
                        "action": "computed",
                        "seq": i - len(pending) + 1 + j,
                        "input_rows": group_input_rows if j == 0 else None,
                        "output_rows": None,
                        "wall_ms": None,
                    }
                )
            pending = []
            df = self._commit_boundary(df, stage, h)
            out_rows = df.count()
            rows_in = out_rows
            self.events[-1].update(
                {
                    "snapshot_id": self.manifest["stages"][h].get("snapshot_id"),
                    "output_rows": out_rows,
                    "output_bytes": self._boundary_bytes(h),
                    "wall_ms": int((time.time() - t0) * 1000),
                }
            )
        self._append_lineage(run_id, input_fingerprint)
        return df

    def _boundary_bytes(self, h: str) -> int | None:
        """On-disk size of a boundary's materialized output (the snapshot's
        own new files in catalog mode; the parquet dir otherwise) — pure
        filesystem metadata, no Spark job."""
        entry = self.manifest["stages"].get(h, {})
        if "snapshot_id" in entry and self.catalog is not None:
            try:
                m = self.catalog.manifest(self.table, entry["snapshot_id"])
            except FileNotFoundError:
                return None
            return sum(
                os.path.getsize(f)
                for f in m.get("new_files", [])
                if os.path.exists(f)
            )
        if "path" in entry:
            total = 0
            for root, _, files in os.walk(entry["path"]):
                total += sum(
                    os.path.getsize(os.path.join(root, fn))
                    for fn in files
                    if fn.endswith(".parquet")
                )
            return total
        return None

    def _append_lineage(self, run_id: str, input_fingerprint: str) -> None:
        by_name = {s.name: s for s in self.stages}
        now_ms = int(time.time() * 1000)
        with open(self._lineage_path, "a") as f:
            for e in self.events:
                entry = self.manifest["stages"].get(e["hash"], {})
                row = {
                    "run_id": run_id,
                    "run_seq": self._run_count,
                    "seq": e.get("seq"),
                    "stage": e["stage"],
                    "stage_hash": e["hash"],
                    "action": e["action"],
                    "snapshot_id": e.get("snapshot_id"),
                    "path": entry.get("path"),
                    "input_rows": e.get("input_rows"),
                    "output_rows": e.get("output_rows"),
                    "output_bytes": e.get("output_bytes"),
                    "wall_ms": e.get("wall_ms"),
                    "input_fingerprint": input_fingerprint,
                    "config": _stable_json(by_name[e["stage"]].config),
                    "ts_ms": now_ms,
                }
                f.write(json.dumps(row) + "\n")

    def lineage_df(self) -> DataFrame:
        """The per-stage run-lineage log as a queryable DataFrame — the
        audit table a curation search over thousands of pipeline runs
        filters ('which runs dropped >90% of rows at decontaminate?',
        'which stage hash produced snapshot X?'). Empty-log safe."""
        return lineage_table(self.spark, self.dir)


def lineage_table(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Read a checkpoint dir's run-lineage log without constructing the
    pipeline (the CLI / notebook audit path). Empty-log safe."""
    path = os.path.join(checkpoint_dir, "lineage.jsonl")
    if not os.path.exists(path):
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return spark.read.schema(LINEAGE_SCHEMA).json(path)
