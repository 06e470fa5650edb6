"""Snapshot-versioned parquet tables — the Iceberg stand-in.

No iceberg-spark-runtime jar exists in this environment, so the reference's
Iceberg surface (SURVEY.md §2.1 S5-S14) is reproduced on plain parquet with
a JSON metadata file providing the same observable semantics:

- snapshot ids + history            (`bronze-silver.py:116-138`, metadata table)
- incremental snapshot-range reads  (`bronze-silver.py:146-149`, appends-only)
- append / overwrite / DDL-create   (`raw-bronze.py:178-183`, `bronze-silver.py:194-203`)
- partitioned writes                (`raw-bronze.py:175-176`, `bronze-silver.py:199-201`)
- table properties (COW/MOR modes recorded; execution is COW — rewrite —
  since MOR delete-files need the Iceberg runtime) (`raw-bronze.py:159-170`)
- MERGE INTO                        (`bronze-silver.py:249-285`) via
  operators.relational.merge_upsert + a new snapshot commit

Commit protocol: data files land under `data/s<id>/` first, then
`_meta.json` is replaced atomically (tmp + rename). A crash before the
rename leaves the table at the previous snapshot — same commit-then-visible
contract as Iceberg's metadata swap. Single-writer by design (the
reference's jobs are, too; optimistic multi-writer locking is an Iceberg
runtime feature out of scope here).

Scale: the table state is a list of parquet directories; Spark scans them
as a multi-path parquet read with `basePath`, so partition pruning, column
pruning, and predicate pushdown all work normally. Incremental reads scan
only the snapshot directories in range — the same file-skipping effect as
Iceberg's incremental scan.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.relational import merge_upsert

_META = "_meta.json"


@dataclass
class Snapshot:
    snapshot_id: int
    made_current_at: float  # epoch seconds
    operation: str  # "append" | "overwrite" | "create" | "merge"
    dirs: list[str]  # data dirs NEW in this snapshot
    active_dirs: list[str]  # full table state at this snapshot
    summary: dict = field(default_factory=dict)


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- metadata ----------------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, _META)

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, _META))

    def _load(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _commit(self, meta: dict) -> None:
        tmp = self._meta_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)  # atomic snapshot swap

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot(**s) for s in self._load()["snapshots"]]

    def latest_snapshot_id(self) -> int | None:
        snaps = self._load()["snapshots"]
        return snaps[-1]["snapshot_id"] if snaps else None

    def properties(self) -> dict:
        return self._load().get("properties", {})

    # -- DDL ---------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType | str,
        partition_by: list[str] | None = None,
        properties: dict | None = None,
    ) -> "SnapshotTable":
        """Empty-table DDL (reference `bronze-silver.py:171-174,194-203`:
        empty DF + writeTo().create() with format-version/write-mode props)."""
        os.makedirs(root, exist_ok=True)
        if isinstance(schema, T.StructType):
            schema_ddl = schema.simpleString()[len("struct<") : -1]
        else:
            schema_ddl = schema
        t = cls(spark, root)
        t._commit(
            {
                "schema": schema_ddl,
                "partition_by": partition_by or [],
                "properties": {"format-version": "2", **(properties or {})},
                "snapshots": [],
            }
        )
        return t

    def schema(self) -> T.StructType:
        return T.StructType.fromDDL(self._load()["schema"])

    # -- writes ------------------------------------------------------------
    def write(self, df: DataFrame, mode: str = "append", operation: str | None = None) -> int:
        """Append or overwrite; returns the new snapshot id."""
        meta = self._load()
        snaps = meta["snapshots"]
        sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
        rel = f"data/s{sid}"
        out = os.path.join(self.root, rel)
        writer = df.write.mode("overwrite")
        if meta["partition_by"]:
            writer = writer.partitionBy(*meta["partition_by"])
        writer.parquet(out)
        prev_active = snaps[-1]["active_dirs"] if snaps else []
        active = prev_active + [rel] if mode == "append" else [rel]
        snaps.append(
            {
                "snapshot_id": sid,
                "made_current_at": time.time(),
                "operation": operation or mode,
                "dirs": [rel],
                "active_dirs": active,
                "summary": {},
            }
        )
        self._commit(meta)
        return sid

    # -- schema evolution (Iceberg `ALTER TABLE ... ADD/DROP COLUMN`) ------
    def evolve_schema(
        self, add: dict[str, str] | None = None, drop: list[str] | None = None
    ) -> int:
        """Additive/subtractive schema evolution as a METADATA-ONLY commit —
        no data rewrite, exactly like Iceberg. Old files read added columns
        as NULL (explicit read schema projects them in); dropped columns
        vanish from every scan without touching parquet. Renames are NOT
        supported: this stand-in maps columns by name, not Iceberg field
        ids, so a rename cannot be matched to old data — documented
        limitation. Time travel reads each snapshot with the schema current
        AT that snapshot."""
        meta = self._load()
        fields = list(T.StructType.fromDDL(meta["schema"]).fields)
        names = {f.name for f in fields}
        for name, dtype in (add or {}).items():
            if name in names:
                raise ValueError(f"column {name} already exists")
            fields.append(T.StructType.fromDDL(f"`{name}` {dtype}").fields[0])
            names.add(name)  # adds are visible to the drop validation below
        for name in drop or []:
            if name not in names:
                raise ValueError(f"column {name} does not exist")
            names.discard(name)
            if name in meta["partition_by"]:
                raise ValueError(f"cannot drop partition column {name}")
            fields = [f for f in fields if f.name != name]
        new_ddl = T.StructType(fields).simpleString()[len("struct<") : -1]
        snaps = meta["snapshots"]
        sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
        prev_active = snaps[-1]["active_dirs"] if snaps else []
        snaps.append(
            {
                "snapshot_id": sid,
                "made_current_at": time.time(),
                "operation": "evolve-schema",
                "dirs": [],
                "active_dirs": prev_active,
                "summary": {"schema": new_ddl, "prev_schema": meta["schema"]},
            }
        )
        meta["schema"] = new_ddl
        self._commit(meta)
        return sid

    # -- reads -------------------------------------------------------------
    def _read_dirs(self, rels: list[str], schema: T.StructType | None = None) -> DataFrame:
        schema = schema or self.schema()
        if not rels:
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, r) for r in rels]
        # basePath per snapshot dir so partition columns resolve; union them
        dfs = [
            self.spark.read.option("basePath", p).schema(schema).parquet(p) for p in paths
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def scan(self) -> DataFrame:
        """Full current-state scan (S5)."""
        snaps = self._load()["snapshots"]
        return self._read_dirs(snaps[-1]["active_dirs"] if snaps else [])

    def scan_incremental(self, start_snapshot_id: int | None, end_snapshot_id: int) -> DataFrame:
        """Rows appended in (start, end] — Iceberg incremental-read semantics
        (`bronze-silver.py:146-149`): appends only; raises on overwrite in
        range, as Iceberg does."""
        lo = start_snapshot_id or 0
        rels: list[str] = []
        for s in self._load()["snapshots"]:
            if lo < s["snapshot_id"] <= end_snapshot_id:
                if not s["dirs"] and s["operation"] == "evolve-schema":
                    continue  # metadata-only commit: nothing to read
                if s["operation"] not in ("append", "create"):
                    raise ValueError(
                        f"incremental read over non-append snapshot "
                        f"{s['snapshot_id']} ({s['operation']})"
                    )
                rels += s["dirs"]
        return self._read_dirs(rels)

    def history(self) -> DataFrame:
        """Metadata table (S7, `<table>.history`): snapshot_id, made_current_at,
        operation — queried with ORDER BY made_current_at DESC LIMIT 1 in the
        reference (`bronze-silver.py:133-134`)."""
        rows = [
            (
                s["snapshot_id"],
                s["made_current_at"],
                s["operation"],
            )
            for s in self._load()["snapshots"]
        ]
        return self.spark.createDataFrame(
            rows, "snapshot_id long, made_current_at double, operation string"
        )

    # -- merge (J1) --------------------------------------------------------
    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        op_col: str | None = None,
        delete_value: str = "D",
    ) -> int:
        """MERGE INTO: latest-wins upsert of `source` (pre-deduplicated, one
        row per key) into the table; commits a new snapshot. COW execution:
        rewrites the table state (Iceberg MOR would write delete files)."""
        target = self.scan()
        src = source.select(*[c for c in target.columns if c in source.columns],
                            *([op_col] if op_col and op_col not in target.columns else []))
        merged = merge_upsert(target, src, keys, op_col=op_col, delete_value=delete_value)
        merged = merged.select(*target.columns)
        # materialize before the overwrite clobbers input dirs we're reading
        merged_local = merged.localCheckpoint(eager=True)
        return self.write(merged_local, mode="overwrite", operation="merge")

    # -- time travel + maintenance (north star: "time-travel and table
    # maintenance operations"; Iceberg equivalents noted per method) -------
    def schema_at(self, snapshot_id: int) -> T.StructType:
        """Schema current AS OF `snapshot_id`: the earliest later
        evolve-schema commit recorded what the schema was before it."""
        for s in self._load()["snapshots"]:
            if s["snapshot_id"] > snapshot_id and s["operation"] == "evolve-schema":
                return T.StructType.fromDDL(s["summary"]["prev_schema"])
        return self.schema()

    def scan_at(self, snapshot_id: int) -> DataFrame:
        """Time-travel read: table state AS OF `snapshot_id` (Iceberg
        `VERSION AS OF` / `snapshot-id` read option), with the schema as of
        that snapshot."""
        for s in self._load()["snapshots"]:
            if s["snapshot_id"] == snapshot_id:
                return self._read_dirs(s["active_dirs"], schema=self.schema_at(snapshot_id))
        raise ValueError(f"unknown snapshot {snapshot_id}")

    def compact(self, target_partitions: int | None = None) -> int:
        """Rewrite the current state into fewer, larger files (Iceberg
        `rewrite_data_files`). Commits a `compact` snapshot; readers at old
        snapshots still see the old files until expiration."""
        df = self.scan()
        n = target_partitions or max(1, self.spark.sparkContext.defaultParallelism // 4)
        squashed = df.coalesce(n).localCheckpoint(eager=True)
        return self.write(squashed, mode="overwrite", operation="compact")

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest `keep_last` snapshots and delete data
        dirs no surviving snapshot references (Iceberg `expire_snapshots`).
        Returns the expired snapshot ids. Incremental reads over expired
        ranges raise, matching Iceberg. Metadata commits first: a crash
        mid-delete leaves orphan files (harmless), never a broken table."""
        import shutil

        meta = self._load()
        snaps = meta["snapshots"]
        if len(snaps) <= keep_last:
            return []
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        live = {d for s in keep for d in s["active_dirs"]} | {
            d for s in keep for d in s["dirs"]
        }
        expired_ids = [s["snapshot_id"] for s in drop]
        dead = {d for s in drop for d in s["dirs"]} - live
        meta["snapshots"] = keep
        self._commit(meta)
        for rel in dead:
            shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
        return expired_ids
