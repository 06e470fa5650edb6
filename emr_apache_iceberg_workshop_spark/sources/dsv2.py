"""PySpark Python Data Source (DSv2) over the snapshot table format:
`spark.read.format("eiws")` with the same option surface the reference
uses on its Iceberg tables (`bronze-silver.py:146-149` reads
`spark.read.format("iceberg").option("start-snapshot-id", ...)`;
`read_iceberg_duckdb.py:22-44` attaches an external reader to the same
metadata). This closes the documented "library calls only" gap: users
who write `spark.read.format(...)` against the reference can point the
format name here and keep the call shape.

Options (all reads need `table`, or the `.load(path)` path):
- `table`           table root directory
- `branch`          read a named branch's head (default `main`)
- `snapshot-id`     VERSION AS OF: snapshot id, tag, or branch name
- `as-of-timestamp` FOR TIMESTAMP AS OF (epoch seconds or ISO string)
- `start-snapshot-id` / `end-snapshot-id`
                    incremental append-range scan (start, end]
                    (reference option names, `bronze-silver.py:146-149`)

Architecturally this is a SECOND, INDEPENDENT read path: planning walks
`_meta.json` driver-side (the same O(manifest) cost class as the Spark
scan), and executors read the raw parquet with pyarrow — no code shared
with `SnapshotTable.scan()`'s DataFrame pipeline — applying the same
read-time semantics:

- partition-exclusion tuples + mask FILES prune at file granularity
  (the manifest records each file's partition tuple);
- equality deletes with sequence-number semantics (a delete applies to
  rows from dirs committed BEFORE it: `del_sid > dir_sid`);
- positional deletes by (file_rel, row_index) identity;
- column renames read each dir under its historical names
  (`tables.py:_name_at` name-mapping semantics);
- schema evolution via the `prev_schema` summaries (`schema_at`).

A result disagreement between this path and `SnapshotTable.scan()`
means one of them misreads the format — the same writer/reader
independence argument as the byte-level Avro decoder test
(`tests/test_iceberg_external_decode.py`), applied to the table layer.

Scale shape: one InputPartition per live data file — Spark schedules
them like any file-based source; per-file work is a single pyarrow read
+ O(delete-batch) filtering, Arrow batches go zero-copy to the JVM.
Filter pushdown prunes whole FILES on manifest partition values and
column min/max bounds before Spark schedules anything; every filter is
also returned to Spark as unsupported, so Spark re-applies it row-level
and pruning can never change results.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

FORMAT_NAME = "eiws"


# ---------------------------------------------------------------------------
# Pure-metadata helpers (planner side). These mirror the table layer's
# pure functions (tables.py:_head/_lineage/_dir_manifest/schema_at) so the
# read path stays import-independent of any Spark-session machinery; the
# entry/mask helpers ARE shared — they are module-level pure functions.
def _entry_rel(e) -> str:
    return e if isinstance(e, str) else e["dir"]


def _entry_excl(e) -> list:
    return [] if isinstance(e, str) else e.get("exclude", [])


def _entry_masks(e) -> list:
    return [] if isinstance(e, str) else e.get("exclude_masks", [])


def _dir_sid(rel: str) -> int:
    return int(rel.rsplit("/s", 1)[-1])


def _part_str(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _head(meta: dict, branch: str = "main") -> dict | None:
    snaps = meta["snapshots"]
    refs = meta.get("branches", {})
    if branch not in refs:
        if branch == "main":
            return snaps[-1] if snaps else None
        raise ValueError(f"unknown branch {branch!r}")
    sid = refs[branch]
    if sid is None:
        if branch == "main":
            return None
        raise ValueError(f"branch {branch!r} points at no snapshot")
    for s in snaps:
        if s["snapshot_id"] == sid:
            return s
    raise ValueError(f"branch {branch!r} points at expired snapshot {sid}")


def _parent_id(s: dict) -> int | None:
    sid = s["snapshot_id"]
    return s.get("parent_id", sid - 1 if sid > 1 else None)


def _lineage(meta: dict, head_sid: int) -> list[dict]:
    by_id = {s["snapshot_id"]: s for s in meta["snapshots"]}
    chain, cur = [], head_sid
    while cur is not None and cur in by_id:
        s = by_id[cur]
        chain.append(s)
        cur = _parent_id(s)
    return chain


def _dir_manifest(meta: dict, by_sid: dict, rel: str) -> dict:
    s = by_sid.get(_dir_sid(rel))
    if s is not None:
        return s
    return meta.get("dir_manifests", {}).get(rel, {})


def _renames(meta: dict) -> list[tuple[int, str, str]]:
    out = []
    for s in meta.get("snapshots", []):
        r = s.get("summary", {}).get("renamed")
        if r:
            out.append((s["snapshot_id"], r["from"], r["to"]))
    return out


def _name_at(renames: list, dir_sid: int, name: str, as_of: int | None) -> str:
    for rsid, old, new in reversed(renames):
        if rsid <= dir_sid or (as_of is not None and rsid > as_of):
            continue
        if name == new:
            name = old
    return name


def _schema_ddl_at(meta: dict, snapshot_id: int | None) -> str:
    """Schema DDL current as of `snapshot_id` (None = head) —
    tables.py:schema_at semantics from the prev_schema summaries.
    Normalized to space-form DDL: metadata stores either "a bigint, b
    string" or the simpleString form "a:bigint,b:string", and this runs
    in the sessionless data-source worker where fromDDL is unavailable.
    Splitting tracks paren depth so decimal(10,2) commas survive."""
    ddl = meta["schema"]
    if snapshot_id is not None:
        for s in meta["snapshots"]:
            if s["snapshot_id"] > snapshot_id and s["operation"] == "evolve-schema":
                ddl = s["summary"]["prev_schema"]
                break
    fields, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur))
    out = []
    for f in fields:
        f = f.strip()
        if ":" in f.split("(", 1)[0]:
            name, typ = f.split(":", 1)
            out.append(f"{name.strip()} {typ.strip()}")
        else:
            out.append(f)
    return ", ".join(out)


def _load_mask_tuples(root: str, rels: list) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for rel in rels:
        for row in pq.read_table(os.path.join(root, rel)).to_pylist():
            out.append({k: _part_str(v) for k, v in row.items()})
    return out


# ---------------------------------------------------------------------------
# Arrow type mapping: Spark simpleString -> pyarrow type. The worker casts
# every file (and injected partition constant) to this exact schema, so the
# batches Spark receives always match the declared read schema.
def _pa_type(simple: str):
    import pyarrow as pa

    if simple.startswith("decimal("):
        p, s = simple[len("decimal(") : -1].split(",")
        return pa.decimal128(int(p), int(s))
    table = {
        "bigint": pa.int64(),
        "long": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
        "binary": pa.binary(),
    }
    if simple not in table:
        raise ValueError(f"dsv2 reader: unsupported column type {simple!r}")
    return table[simple]


def _parse_part_value(raw: str | None, simple: str):
    """Canonical partition STRING -> python value of the column type."""
    if raw is None:
        return None
    if simple in ("bigint", "long", "int", "integer", "smallint", "tinyint"):
        return int(raw)
    if simple in ("double", "float"):
        return float(raw)
    if simple == "boolean":
        return raw == "true"
    if simple == "date":
        import datetime as dt

        return dt.date.fromisoformat(raw)
    return raw  # string


# ---------------------------------------------------------------------------
@dataclass
class FileSlice(InputPartition):
    """One live data file plus everything its read needs — shipped pickled
    to the executor, so only plain python values."""

    path: str  # absolute data file path
    rel: str  # root-relative path (positional-delete row identity)
    # (output name, name in this file or None if injected, simpleString type)
    columns: list = field(default_factory=list)
    part_values: dict = field(default_factory=dict)  # injected col -> raw str
    # [{'dir': abs delete dir, 'keys': [col], 'key_types': [simple]}]
    eq_deletes: list = field(default_factory=list)
    pos_delete_dirs: list = field(default_factory=list)  # abs dirs


class SnapshotTableReader(DataSourceReader):
    def __init__(self, options, schema_fields: list[tuple[str, str]]):
        self.root = os.path.abspath(options.get("table") or options.get("path") or "")
        if not self.root or not os.path.exists(os.path.join(self.root, "_meta.json")):
            raise ValueError(
                "eiws reader needs .option('table', <root>) or .load(<root>) "
                f"pointing at a snapshot table (got {self.root!r})"
            )
        self.options = options
        self.fields = schema_fields  # [(name, simpleString)] in output order
        self.pushed: list[Filter] = []

    # -- filter pushdown ---------------------------------------------------
    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Record prunable filters, return EVERY filter as unsupported:
        pruning only ever drops whole files that provably contain no
        matching rows, Spark still applies each predicate row-level."""
        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)
            ) and len(f.attribute) == 1:
                self.pushed.append(f)
        return filters

    def _file_may_match(self, f: dict, part: dict) -> bool:
        """Manifest-level pruning: False only when NO row of the file can
        satisfy every pushed filter (partition value or min/max bounds)."""
        bounds = f.get("bounds") or {}
        for flt in self.pushed:
            col = flt.attribute[0]
            if col in part:
                v = part[col]
                if v is None:
                    return not isinstance(
                        flt, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                              LessThanOrEqual, In)
                    )
                lo = hi = v
            elif col in bounds:
                lo, hi = bounds[col]
            else:
                continue
            try:
                if isinstance(flt, EqualTo) and not (lo <= flt.value and flt.value <= hi):
                    return False
                if isinstance(flt, In) and not any(lo <= x <= hi for x in flt.value):
                    return False
                if isinstance(flt, GreaterThan) and not (hi > flt.value):
                    return False
                if isinstance(flt, GreaterThanOrEqual) and not (hi >= flt.value):
                    return False
                if isinstance(flt, LessThan) and not (lo < flt.value):
                    return False
                if isinstance(flt, LessThanOrEqual) and not (lo <= flt.value):
                    return False
            except TypeError:
                continue  # incomparable manifest value: keep the file
        return True

    # -- planning ----------------------------------------------------------
    def _resolve_snapshot(self, meta: dict) -> tuple[dict | None, int | None]:
        """(snapshot entry, as_of sid for the rename mapping)."""
        opt = self.options
        ref = opt.get("snapshot-id")
        if ref is not None:
            tags, branches = meta.get("tags", {}), meta.get("branches", {})
            if not str(ref).lstrip("-").isdigit():
                if ref in tags:
                    ref = tags[ref]
                elif ref in branches:
                    ref = branches[ref]
                else:
                    raise ValueError(f"unknown ref {ref!r}")
            sid = int(ref)
            for s in meta["snapshots"]:
                if s["snapshot_id"] == sid:
                    return s, sid
            raise ValueError(f"unknown snapshot {sid}")
        ts = opt.get("as-of-timestamp")
        if ts is not None:
            import datetime as dt

            try:
                ts_f = float(ts)
            except ValueError:
                ts_f = (
                    dt.datetime.fromisoformat(ts)
                    .replace(tzinfo=dt.timezone.utc)
                    .timestamp()
                )
            head = _head(meta)
            if head is None:
                raise ValueError("empty table: no snapshot at or before that time")
            for s in _lineage(meta, head["snapshot_id"]):
                if float(s["made_current_at"]) <= ts_f:
                    return s, s["snapshot_id"]
            raise ValueError(f"no snapshot at or before {ts}")
        head = _head(meta, self.options.get("branch", "main"))
        return head, None

    def _incremental_dirs(self, meta: dict) -> list[str]:
        """(start, end] append dirs — tables.py:scan_incremental semantics,
        including the raise on non-append commits and expired ranges."""
        lo = int(self.options.get("start-snapshot-id") or 0)
        end = int(self.options["end-snapshot-id"])
        chain = _lineage(meta, end)
        if not chain or chain[0]["snapshot_id"] != end:
            raise ValueError(f"unknown snapshot {end}")
        rels: list[str] = []
        reached_lo = lo == 0 and _parent_id(chain[-1]) is None
        for s in chain:
            if s["snapshot_id"] <= lo:
                reached_lo = True
                break
            if not s["dirs"] and s["operation"] in ("evolve-schema", "evolve-partition"):
                continue
            if s["operation"] not in ("append", "create"):
                raise ValueError(
                    f"incremental read over non-append snapshot "
                    f"{s['snapshot_id']} ({s['operation']})"
                )
            rels += s["dirs"]
        if not reached_lo and not (lo == 0 and _parent_id(chain[-1]) is None):
            raise ValueError(f"incremental range ({lo}, {end}] spans expired snapshots")
        return rels

    def partitions(self):
        with open(os.path.join(self.root, "_meta.json")) as fh:
            meta = json.load(fh)
        by_sid = {s["snapshot_id"]: s for s in meta["snapshots"]}
        renames = _renames(meta)

        incremental = self.options.get("end-snapshot-id") is not None
        if incremental:
            entries: list = list(self._incremental_dirs(meta))
            deletes: list = []
            as_of = None
        else:
            snap, as_of = self._resolve_snapshot(meta)
            if snap is None:
                # empty table: one sentinel slice that reads no rows (the
                # API requires >= 1 partition)
                return [FileSlice(path="", rel="", columns=[])]
            entries = snap["active_dirs"]
            deletes = snap.get("active_deletes", [])

        out: list[FileSlice] = []
        for e in entries:
            rel, excl = _entry_rel(e), _entry_excl(e)
            excl = excl + _load_mask_tuples(self.root, _entry_masks(e))
            dsid = _dir_sid(rel)
            ws = _dir_manifest(meta, by_sid, rel)
            # deletes committed after this dir apply to its rows
            eq, pos = [], []
            for d in deletes:
                if d["sid"] <= dsid:
                    continue
                if d.get("style") == "position":
                    pos.append(os.path.join(self.root, d["file"]))
                else:
                    eq.append(
                        {
                            "dir": os.path.join(self.root, d["file"]),
                            "keys": list(d["keys"]),
                        }
                    )
            for f in ws.get("files", []):
                if not f["path"].startswith(rel + "/") and f["path"] != rel:
                    continue
                part = {k: _part_str(v) for k, v in f["partition"].items()}
                if part in excl:
                    continue  # rewritten by a later partition-scoped commit
                if not self._file_may_match(f, f["partition"]):
                    continue  # pushed-filter file pruning
                cols = []
                for name, simple in self.fields:
                    if name in f["partition"]:
                        cols.append((name, None, simple))  # injected constant
                    else:
                        cols.append((name, _name_at(renames, dsid, name, as_of), simple))
                out.append(
                    FileSlice(
                        path=os.path.join(self.root, f["path"]),
                        rel=f["path"],
                        columns=cols,
                        part_values={
                            name: part.get(name)
                            for name, _h, _t in cols
                            if name in f["partition"]
                        },
                        eq_deletes=eq,
                        pos_delete_dirs=pos,
                    )
                )
        return out

    # -- executor side -----------------------------------------------------
    def read(self, partition: FileSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.path:  # empty-table sentinel
            return
        file_cols = [h for _n, h, _t in partition.columns if h is not None]
        t = pq.read_table(partition.path, columns=file_cols)
        n = t.num_rows
        keep = None  # None = all rows; else a python list[bool]

        if partition.pos_delete_dirs:
            dead: set[int] = set()
            for d in partition.pos_delete_dirs:
                pt = pq.read_table(d)
                rels = pt.column("file_rel").to_pylist()
                poss = pt.column("pos").to_pylist()
                dead.update(p for r, p in zip(rels, poss) if r == partition.rel)
            if dead:
                keep = [i not in dead for i in range(n)]

        for d in partition.eq_deletes:
            dt_ = pq.read_table(d["dir"], columns=d["keys"])
            dset = set(zip(*[dt_.column(k).to_pylist() for k in d["keys"]]))
            if not dset:
                continue
            # key columns under their IN-FILE (historical) names
            by_out = {name: h for name, h, _t in partition.columns}
            kcols = []
            for k in d["keys"]:
                h = by_out.get(k, k)
                if h is None:  # key is an injected partition column
                    simple = next(t_ for nm, _h, t_ in partition.columns if nm == k)
                    v = _parse_part_value(partition.part_values.get(k), simple)
                    kcols.append([v] * n)
                else:
                    kcols.append(t.column(h).to_pylist())
            mask = [tup not in dset for tup in zip(*kcols)]
            keep = mask if keep is None else [a and b for a, b in zip(keep, mask)]

        if keep is not None:
            t = t.filter(pa.array(keep))

        arrays, names = [], []
        for name, hist, simple in partition.columns:
            typ = _pa_type(simple)
            if hist is None:
                v = _parse_part_value(partition.part_values.get(name), simple)
                arrays.append(pa.array([v] * t.num_rows, type=typ))
            else:
                arrays.append(t.column(hist).cast(typ))
            names.append(name)
        yield from pa.table(arrays, names=names).to_batches()


class SnapshotTableDataSource(DataSource):
    """`spark.read.format("eiws")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        root = os.path.abspath(
            self.options.get("table") or self.options.get("path") or ""
        )
        if not root or not os.path.exists(os.path.join(root, "_meta.json")):
            raise ValueError(
                "eiws reader needs .option('table', <root>) or .load(<root>) "
                f"pointing at a snapshot table (got {root!r})"
            )
        with open(os.path.join(root, "_meta.json")) as fh:
            meta = json.load(fh)
        sid = self.options.get("snapshot-id")
        as_of = int(sid) if sid is not None and str(sid).lstrip("-").isdigit() else None
        return _schema_ddl_at(meta, as_of)

    def reader(self, schema) -> SnapshotTableReader:
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        return SnapshotTableReader(self.options, fields)


def register(spark) -> None:
    """Idempotently register the format with a session. Python-data-source
    filter pushdown is opt-in (SPARK-50952); without it Spark refuses any
    reader implementing pushFilters()."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static-conf session: must be set at build time instead
    spark.dataSource.register(SnapshotTableDataSource)
