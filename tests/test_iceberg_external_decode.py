"""Independent, from-scratch decode of the emitted Iceberg metadata chain.

The repo's own `read_avro_container` / `read_table_chain` share encoding
helpers with the writer, so a spec misreading there would be invisible to
a same-author round-trip (the S17 interop risk called out in VERDICT r07).
This module re-implements the external reader's walk — Avro object
container parsing + binary decoding + Iceberg manifest interpretation —
from the PUBLIC specs alone (Avro 1.11 "Object Container Files" /
"Binary Encoding"; Iceberg table spec "Manifests" / "Manifest Lists"),
importing ONLY the stdlib (`struct`, `json`, `os`) — ZERO imports from
`emr_apache_iceberg_workshop_spark.iceberg_meta`. The engine is used
solely to BUILD tables and emit metadata; everything on the read side is
this file.

Covered states (VERDICT r07 task 2): v1 partitioned, v2 equality-delete,
v2 positional-delete, multi-spec, and renamed (name-mapping) tables —
asserting spec field-ids (500-517 manifest list, 0-4 entry, 100-140
data_file), sequence-number rules, delete-file content codes, and
duplicate-free stats maps.
"""

from __future__ import annotations

import json
import os
import struct

import pytest

from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

# ---------------------------------------------------------------------------
# Avro binary decoding, straight from the Avro spec (no shared code)
# ---------------------------------------------------------------------------


class _Buf:
    def __init__(self, data: bytes):
        self._d = data
        self._i = 0

    def take(self, n: int) -> bytes:
        out = self._d[self._i : self._i + n]
        if len(out) != n:
            raise EOFError(f"wanted {n} bytes, got {len(out)}")
        self._i += n
        return out

    def at_end(self) -> bool:
        return self._i >= len(self._d)

    def varlong(self) -> int:
        """Zigzag varint per the Avro binary-encoding spec."""
        acc = 0
        shift = 0
        while True:
            b = self.take(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _avro_decode(buf: _Buf, schema):
    """Decode one datum against its (already JSON-parsed) writer schema.

    Handles the constructs Avro allows in Iceberg metadata files:
    records, [null, T] unions, arrays (including negative block counts,
    which per spec carry a byte size), maps, and primitives.
    """
    if isinstance(schema, list):  # union: long index selects the branch
        idx = buf.varlong()
        assert 0 <= idx < len(schema), f"union index {idx} out of range"
        return _avro_decode(buf, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _avro_decode(buf, f["type"]) for f in schema["fields"]}
        if t == "array":
            items = []
            while True:
                n = buf.varlong()
                if n == 0:
                    break
                if n < 0:  # block byte-size follows; item count is |n|
                    buf.varlong()
                    n = -n
                for _ in range(n):
                    items.append(_avro_decode(buf, schema["items"]))
            return items
        if t == "map":
            out = {}
            while True:
                n = buf.varlong()
                if n == 0:
                    break
                if n < 0:
                    buf.varlong()
                    n = -n
                for _ in range(n):
                    k = buf.take(buf.varlong()).decode("utf-8")
                    out[k] = _avro_decode(buf, schema["values"])
            return out
        if t == "fixed":
            return buf.take(schema["size"])
        return _avro_decode(buf, t)  # {"type": "long", ...} annotation wrapper
    if schema in ("long", "int"):
        return buf.varlong()
    if schema == "string":
        return buf.take(buf.varlong()).decode("utf-8")
    if schema == "bytes":
        return buf.take(buf.varlong())
    if schema == "boolean":
        return buf.take(1) == b"\x01"
    if schema == "double":
        return struct.unpack("<d", buf.take(8))[0]
    if schema == "float":
        return struct.unpack("<f", buf.take(4))[0]
    if schema == "null":
        return None
    raise AssertionError(f"unsupported avro type {schema!r}")


def read_container(path: str) -> tuple[dict, dict[str, bytes], list]:
    """Parse an Avro Object Container File: magic, file-metadata map,
    16-byte sync, then (count, size, data, sync) blocks until EOF."""
    with open(path, "rb") as f:
        buf = _Buf(f.read())
    assert buf.take(4) == b"Obj\x01", "bad container magic"
    meta: dict[str, bytes] = {}
    while True:
        n = buf.varlong()
        if n == 0:
            break
        if n < 0:
            buf.varlong()
            n = -n
        for _ in range(n):
            k = buf.take(buf.varlong()).decode("utf-8")
            meta[k] = buf.take(buf.varlong())
    sync = buf.take(16)
    assert meta.get("avro.codec", b"null") == b"null", "codec must be null"
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    records: list = []
    while not buf.at_end():
        count = buf.varlong()
        size = buf.varlong()
        block = _Buf(buf.take(size))
        for _ in range(count):
            records.append(_avro_decode(block, schema))
        assert block.at_end(), "trailing bytes inside block"
        assert buf.take(16) == sync, "sync marker mismatch"
    return schema, meta, records


# ---------------------------------------------------------------------------
# Schema-annotation helpers (field-id checks against the Iceberg spec)
# ---------------------------------------------------------------------------


def _field_ids(record_schema: dict) -> dict[str, int]:
    return {
        f["name"]: f["field-id"]
        for f in record_schema["fields"]
        if "field-id" in f
    }


def _walk_chain(md_path: str):
    """metadata.json -> per-snapshot manifest list -> manifests, all via
    this module's decoder. Returns (doc, {snapshot_id: (mlist_records,
    [(mlist_rec, manifest_schema, manifest_meta, entries), ...])})."""
    with open(md_path) as f:
        doc = json.load(f)
    out = {}
    for snap in doc["snapshots"]:
        _, _, mlist = read_container(snap["manifest-list"])
        manifests = []
        for mrec in mlist:
            msch, mmeta, entries = read_container(mrec["manifest_path"])
            manifests.append((mrec, msch, mmeta, entries))
        out[snap["snapshot-id"]] = (mlist, manifests)
    return doc, out


# Iceberg spec, "Manifest Lists" table
_MANIFEST_LIST_IDS = {
    "manifest_path": 500,
    "manifest_length": 501,
    "partition_spec_id": 502,
    "added_snapshot_id": 503,
    "added_data_files_count": 504,
    "existing_data_files_count": 505,
    "deleted_data_files_count": 506,
    "added_rows_count": 512,
    "existing_rows_count": 513,
    "deleted_rows_count": 514,
}
_MANIFEST_LIST_IDS_V2 = {
    **_MANIFEST_LIST_IDS,
    "content": 517,
    "sequence_number": 515,
    "min_sequence_number": 516,
}

# Iceberg spec, "Manifests" table (entry + data_file fields)
_ENTRY_IDS_V1 = {"status": 0, "snapshot_id": 1, "data_file": 2}
_ENTRY_IDS_V2 = {**_ENTRY_IDS_V1, "sequence_number": 3, "file_sequence_number": 4}
_DATA_FILE_IDS_COMMON = {
    "file_path": 100,
    "file_format": 101,
    "partition": 102,
    "record_count": 103,
    "file_size_in_bytes": 104,
    "value_counts": 109,
    "null_value_counts": 110,
    "lower_bounds": 125,
    "upper_bounds": 128,
    "split_offsets": 132,
}
_DATA_FILE_IDS_V1 = {**_DATA_FILE_IDS_COMMON, "block_size_in_bytes": 105}
_DATA_FILE_IDS_V2 = {**_DATA_FILE_IDS_COMMON, "content": 134, "equality_ids": 135}


def _check_manifest_schemas(msch: dict, fv: int) -> None:
    ids = _field_ids(msch)
    want_entry = _ENTRY_IDS_V2 if fv == 2 else _ENTRY_IDS_V1
    for name, fid in want_entry.items():
        assert ids.get(name) == fid, f"entry field {name}: {ids.get(name)} != {fid}"
    df_schema = next(f for f in msch["fields"] if f["name"] == "data_file")["type"]
    df_ids = _field_ids(df_schema)
    want_df = _DATA_FILE_IDS_V2 if fv == 2 else _DATA_FILE_IDS_V1
    for name, fid in want_df.items():
        assert df_ids.get(name) == fid, f"data_file {name}: {df_ids.get(name)} != {fid}"


def _check_mlist_schema(mlist_path: str, fv: int) -> list:
    sch, meta, recs = read_container(mlist_path)
    ids = _field_ids(sch)
    want = _MANIFEST_LIST_IDS_V2 if fv == 2 else _MANIFEST_LIST_IDS
    for name, fid in want.items():
        assert ids.get(name) == fid, f"manifest_file {name}: {ids.get(name)} != {fid}"
    return recs


def _stats_keys(stats) -> list[int]:
    """Map-logicalType stats column -> its int keys (None -> [])."""
    if stats is None:
        return []
    return [kv["key"] for kv in stats]


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl).coalesce(1)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_v1_partitioned_chain(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(spark, str(tmp_path / "v1"), ddl, partition_by=["category"])
    t.write(_mk(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)], ddl))
    t.write(_mk(spark, [(4, "c", 40)], ddl))
    md = write_iceberg_metadata(t)

    doc, chains = _walk_chain(md)
    assert doc["format-version"] == 1
    # schema field ids are 1-based and sequential for a flat schema
    assert [f["id"] for f in doc["schema"]["fields"]] == [1, 2, 3]
    head_mlist, head_manifests = chains[doc["current-snapshot-id"]]
    _check_mlist_schema(doc["snapshots"][-1]["manifest-list"], fv=1)
    total = 0
    for mrec, msch, mmeta, entries in head_manifests:
        _check_manifest_schemas(msch, fv=1)
        # manifest_length must be the actual byte length on disk
        assert mrec["manifest_length"] == os.path.getsize(mrec["manifest_path"])
        assert mmeta["content"] == b"data"
        for e in entries:
            df = e["data_file"]
            assert e["status"] == 1  # v1 emission: every live file ADDED
            assert df["file_format"] == "PARQUET"
            assert os.path.getsize(df["file_path"]) == df["file_size_in_bytes"]
            # identity partition value decodes to the category string
            assert set(df["partition"]) == {"category"}
            total += df["record_count"]
            # stats maps: unique keys drawn from the schema's field ids
            for col in ("value_counts", "null_value_counts"):
                keys = _stats_keys(df[col])
                assert len(keys) == len(set(keys)), f"duplicate keys in {col}"
                assert set(keys) <= {1, 2, 3}
            # every column holds record_count values (flat schema)
            assert all(
                kv["value"] == df["record_count"] for kv in df["value_counts"]
            )
    assert total == t.scan().count() == 4
    # counts in the manifest list agree with the decoded entries
    assert sum(m["added_data_files_count"] for m in head_mlist) == sum(
        len(entries) for _, _, _, entries in head_manifests
    )
    assert sum(m["added_rows_count"] for m in head_mlist) == 4


def test_v2_equality_delete_chain(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, str(tmp_path / "eq"), ddl,
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.write(_mk(spark, [(1, "a"), (2, "b")], ddl))
    t.merge(_mk(spark, [(2, "b2"), (3, "c")], ddl), keys=["id"])
    md = write_iceberg_metadata(t)

    doc, chains = _walk_chain(md)
    assert doc["format-version"] == 2
    head_sid = doc["current-snapshot-id"]
    head = next(s for s in doc["snapshots"] if s["snapshot-id"] == head_sid)
    assert head["sequence-number"] <= doc["last-sequence-number"]
    mlist = _check_mlist_schema(head["manifest-list"], fv=2)
    by_content = {}
    for mrec in mlist:
        by_content.setdefault(mrec["content"], []).append(mrec)
    assert set(by_content) == {0, 1}, "expected one data + one delete manifest"

    for mrec in mlist:
        msch, mmeta, entries = read_container(mrec["manifest_path"])
        _check_manifest_schemas(msch, fv=2)
        # sequence-number rules: every entry's sequence number sits in
        # [min_sequence_number, sequence_number] of its manifest, and
        # under the table's last-sequence-number
        for e in entries:
            assert e["sequence_number"] is not None
            assert mrec["min_sequence_number"] <= e["sequence_number"]
            assert e["sequence_number"] <= mrec["sequence_number"]
            assert e["sequence_number"] <= doc["last-sequence-number"]
        # added/existing counts split by entry status (r08 fix)
        n_added = sum(1 for e in entries if e["status"] == 1)
        rows_added = sum(
            e["data_file"]["record_count"] for e in entries if e["status"] == 1
        )
        rows_total = sum(e["data_file"]["record_count"] for e in entries)
        assert mrec["added_data_files_count"] == n_added
        assert mrec["existing_data_files_count"] == len(entries) - n_added
        assert mrec["added_rows_count"] == rows_added
        assert mrec["existing_rows_count"] == rows_total - rows_added
        if mrec["content"] == 0:
            assert mmeta["content"] == b"data"
            assert all(e["data_file"]["content"] == 0 for e in entries)
        else:
            assert mmeta["content"] == b"deletes"
            # equality-delete content code is 2 (spec: POSITION=1, EQUALITY=2)
            assert [e["data_file"]["content"] for e in entries] == [2]
            (de,) = entries
            # equality ids name the merge key's field id
            assert de["data_file"]["equality_ids"] == [1]
            # delete applies only to files with STRICTLY older sequences
            data_entries = [
                e
                for m in by_content[0]
                for e in read_container(m["manifest_path"])[2]
            ]
            assert any(
                e["sequence_number"] < de["sequence_number"] for e in data_entries
            )


def test_v2_positional_delete_chain(spark, tmp_path):
    import pyarrow.parquet as pq

    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, str(tmp_path / "pos"), ddl,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.style": "position",
        },
    )
    t.write(_mk(spark, [(1, "a"), (2, "b"), (3, "c")], ddl))
    t.delete_where("id = 2")
    md = write_iceberg_metadata(t)

    doc, chains = _walk_chain(md)
    assert doc["format-version"] == 2
    head = next(
        s for s in doc["snapshots"] if s["snapshot-id"] == doc["current-snapshot-id"]
    )
    mlist = _check_mlist_schema(head["manifest-list"], fv=2)
    dmans = [m for m in mlist if m["content"] == 1]
    assert len(dmans) == 1
    _, mmeta, dentries = read_container(dmans[0]["manifest_path"])
    assert mmeta["content"] == b"deletes"
    # positional-delete content code is 1
    assert [e["data_file"]["content"] for e in dentries] == [1]
    (de,) = dentries
    # the delete parquet itself must carry the spec'd (file_path, pos)
    # columns so external engines can apply it without engine knowledge
    phys = pq.ParquetFile(de["data_file"]["file_path"]).schema_arrow
    assert [phys.field(i).name for i in range(2)] == ["file_path", "pos"]
    assert de["data_file"]["record_count"] == 1


def test_multi_spec_chain(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, category string, part string"
    t = SnapshotTable.create(spark, str(tmp_path / "ms"), ddl, partition_by=["part"])
    t.write(_mk(spark, [(1, "a", "x")], ddl))
    t.evolve_partition_spec(["category"])
    t.write(_mk(spark, [(2, "b", "y")], ddl))
    md = write_iceberg_metadata(t)

    doc, chains = _walk_chain(md)
    specs = {s["spec-id"]: s["fields"] for s in doc["partition-specs"]}
    assert len(specs) == 2
    # partition field ids start at 1000 and never collide across specs
    fids = [f["field-id"] for fields in specs.values() for f in fields]
    assert sorted(fids) == [1000, 1001]
    _, manifests = chains[doc["current-snapshot-id"]]
    seen_specs = set()
    for mrec, msch, mmeta, entries in manifests:
        if mrec.get("content", 0) != 0:
            continue
        spec_id = mrec["partition_spec_id"]
        seen_specs.add(spec_id)
        # embedded manifest metadata pins the same spec id
        assert int(mmeta["partition-spec-id"].decode()) == spec_id
        # the partition record's field names + ids match the declared spec
        part_schema = next(
            f for f in msch["fields"] if f["name"] == "data_file"
        )["type"]
        part_rec = next(
            f for f in part_schema["fields"] if f["name"] == "partition"
        )["type"]
        declared = {(f["name"], f["field-id"]) for f in specs[spec_id]}
        got = {(f["name"], f["field-id"]) for f in part_rec["fields"]}
        assert got == declared
        for e in entries:
            assert set(e["data_file"]["partition"]) == {f["name"] for f in specs[spec_id]}
    assert seen_specs == set(specs)


def test_rename_has_no_duplicate_stats_keys_and_name_mapping(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, v string"
    t = SnapshotTable.create(spark, str(tmp_path / "rn"), ddl)
    t.write(_mk(spark, [(1, "a"), (2, "b")], ddl))
    t.rename_column("v", "val")
    t.write(_mk(spark, [(3, "c")], "id bigint, val string"))
    md = write_iceberg_metadata(t)

    doc, chains = _walk_chain(md)
    # name-mapping property carries both names for the renamed field id
    nm = {
        e["field-id"]: sorted(e["names"])
        for e in json.loads(doc["properties"]["schema.name-mapping.default"])
    }
    val_id = next(f["id"] for f in doc["schema"]["fields"] if f["name"] == "val")
    assert nm[val_id] == ["v", "val"]
    # the historical-alias expansion must NOT surface as duplicate map
    # keys in any stats column of any emitted manifest (r08 fix)
    n_checked = 0
    for _mlist, manifests in chains.values():
        for _mrec, _msch, _mmeta, entries in manifests:
            for e in entries:
                df = e["data_file"]
                for col in ("value_counts", "null_value_counts",
                            "lower_bounds", "upper_bounds"):
                    keys = _stats_keys(df.get(col))
                    assert len(keys) == len(set(keys)), f"dup keys in {col}"
                    n_checked += 1
    assert n_checked > 0


def test_dynamic_overwrite_lineage_chain(spark, tmp_path):
    """Dynamic partition overwrite decoded externally: the head snapshot
    lists the replacement file plus the untouched partitions' ORIGINAL
    files (same paths, still byte-identical), the replaced partition's
    old file is gone from the head manifests, and the pre-overwrite
    snapshot's own manifest list still serves the old state (external
    time travel across the overwrite)."""
    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(
        spark, str(tmp_path / "dyn"), ddl, partition_by=["category"]
    )
    t.write(_mk(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ddl))
    t.overwrite_partitions(_mk(spark, [(9, "a", 90)], ddl))
    md = write_iceberg_metadata(t)

    doc, chains = _walk_chain(md)
    assert doc["format-version"] == 1

    def files_of(sid):
        _mlist, manifests = chains[sid]
        return {
            e["data_file"]["file_path"]: e["data_file"]["record_count"]
            for _, _, _, entries in manifests
            for e in entries
        }

    s1, s2 = (s["snapshot-id"] for s in doc["snapshots"])
    f1, f2 = files_of(s1), files_of(s2)
    old_a = {p for p in f1 if "/category=a/" in p}
    kept = {p for p in f1 if "/category=a/" not in p}
    new_a = {p for p in f2 if "/category=a/" in p}
    assert old_a and kept and new_a
    assert not (old_a & new_a)  # the a-partition file was REPLACED
    assert kept <= set(f2)  # b/c files carried over by path, not rewritten
    assert old_a.isdisjoint(f2)  # replaced file absent from the head
    # every listed file exists with its recorded length (incl. the
    # replaced one — time travel to s1 must still be externally servable)
    for sid in (s1, s2):
        _mlist, manifests = chains[sid]
        for _, _, _, entries in manifests:
            for e in entries:
                df = e["data_file"]
                assert os.path.getsize(df["file_path"]) == df["file_size_in_bytes"]
    # operation + summary counters record the overwrite truthfully
    head = doc["snapshots"][-1]
    assert head["summary"]["operation"] == "overwrite"
    assert head["summary"]["deleted-data-files"] == str(len(old_a))
    assert head["summary"]["added-data-files"] == str(len(new_a))
    assert head["summary"]["total-records"] == str(sum(f2.values()))


def test_statistics_pointer_and_puffin_footer(spark, tmp_path):
    """The metadata.json `statistics` field decoded per the table spec,
    and the referenced Puffin file re-parsed from the container spec
    alone (magic/footer layout, stdlib struct+json): the pointer's
    blob-metadata must mirror the file's own footer blobs, pin the
    current snapshot, and carry the consumable ndv property."""
    import struct

    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, v string"
    t = SnapshotTable.create(spark, str(tmp_path / "st"), ddl)
    t.write(_mk(spark, [(i, f"s{i % 7}") for i in range(200)], ddl))
    t.analyze(["id", "v"])
    md = write_iceberg_metadata(t)
    with open(md) as f:
        doc = json.load(f)

    stats = doc["statistics"]
    assert len(stats) == 1
    entry = stats[0]
    # spec-required keys of a statistics-file entry
    assert entry["snapshot-id"] == doc["current-snapshot-id"]
    path = entry["statistics-path"]
    assert os.path.getsize(path) == entry["file-size-in-bytes"]
    for b in entry["blob-metadata"]:
        assert b["snapshot-id"] == doc["current-snapshot-id"]
        assert b["type"] == "apache-datasketches-theta-v1"
        assert int(b["properties"]["ndv"]) > 0

    # independent Puffin container parse (puffin-spec): leading magic,
    # trailing [magic, payload, payload-size int32 LE, flags, magic]
    with open(path, "rb") as f:
        raw = f.read()
    assert raw[:4] == b"PFA1" and raw[-4:] == b"PFA1"
    size = struct.unpack("<i", raw[-12:-8])[0]
    assert struct.unpack("<i", raw[-8:-4])[0] == 0  # flags: uncompressed
    payload = raw[-12 - size:-12]
    footer_magic = raw[-12 - size - 4:-12 - size]
    assert footer_magic == b"PFA1"
    footer = json.loads(payload)
    blobs = footer["blobs"]
    # footer size recorded in the table metadata = magic+payload+size+flags+magic
    assert entry["file-footer-size-in-bytes"] == 4 + size + 4 + 4 + 4
    # pointer blob-metadata mirrors the footer blobs (minus offsets)
    strip = [
        {k: v for k, v in b.items() if k not in ("offset", "length")}
        for b in blobs
    ]
    assert strip == entry["blob-metadata"]
    # blob extents sit inside the body and carry sketch bytes
    for b in blobs:
        assert 4 <= b["offset"] and b["offset"] + b["length"] <= len(raw) - (
            entry["file-footer-size-in-bytes"]
        )
        assert raw[b["offset"]] in (1, 3)  # theta preamble longs
    # the two analyzed columns map to the schema's field ids
    ids = {f["name"]: f["id"] for f in doc["schema"]["fields"]}
    assert sorted(b["fields"][0] for b in blobs) == sorted(
        [ids["id"], ids["v"]]
    )


def test_sort_order_metadata_decode(spark, tmp_path):
    """Declared write order decoded from the metadata: spec-shaped
    sort-orders (order-id, identity transform, source-id, direction,
    null-order), default-sort-order-id points at it, and the data files
    are ACTUALLY ordered on the declared column within each file."""
    import pyarrow.parquet as pq

    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint, v bigint"
    t = SnapshotTable.create(
        spark, str(tmp_path / "so"), ddl,
        properties={"write.sort-order": "v"},
    )
    rows = [(i, (i * 37) % 101) for i in range(300)]
    t.write(spark.createDataFrame(rows, ddl).coalesce(2))
    md = write_iceberg_metadata(t)
    doc, chains = _walk_chain(md)

    oid = doc["default-sort-order-id"]
    assert oid != 0  # a real declared order, not the unsorted default
    order = next(o for o in doc["sort-orders"] if o["order-id"] == oid)
    ids = {f["name"]: f["id"] for f in doc["schema"]["fields"]}
    assert order["fields"] == [
        {
            "transform": "identity",
            "source-id": ids["v"],
            "direction": "asc",
            "null-order": "nulls-first",
        }
    ]
    # order-id 0 (unsorted) must still be declared for older snapshots
    assert any(o["order-id"] == 0 for o in doc["sort-orders"])
    # the contract is real: every data file is internally sorted on v
    _mlist, manifests = chains[doc["current-snapshot-id"]]
    checked = 0
    for _, _, _, entries in manifests:
        for e in entries:
            vals = pq.read_table(
                e["data_file"]["file_path"], columns=["v"]
            ).column("v").to_pylist()
            assert vals == sorted(vals)
            checked += 1
    assert checked >= 1


def test_metadata_log_chain_decode(spark, tmp_path):
    """Latest-metadata discovery + the metadata-log chain, verified from
    the files alone (the reference reader's rule: list metadata/, filter
    *.metadata.json, take the last by version — read_iceberg_duckdb.py:
    22-44): the discovered file's metadata-log lists every prior version
    newest-last, each entry's timestamp-ms equals that prior file's own
    last-updated-ms, and version-hint.text agrees with the listing."""
    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata

    ddl = "id bigint"
    t = SnapshotTable.create(spark, str(tmp_path / "ml"), ddl)
    for i in range(3):
        t.write(_mk(spark, [(i,)], ddl))
        write_iceberg_metadata(t)

    meta_dir = os.path.join(t.root, "metadata")
    names = [n for n in os.listdir(meta_dir) if n.endswith(".metadata.json")]
    # the reference's sort, version-keyed for Hadoop-style names
    latest = sorted(
        names, key=lambda n: int(n[1:].split(".")[0])
    )[-1]
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        assert latest == f"v{f.read().strip()}.metadata.json"
    with open(os.path.join(meta_dir, latest)) as f:
        doc = json.load(f)
    log = doc["metadata-log"]
    assert [os.path.basename(e["metadata-file"]) for e in log] == [
        "v1.metadata.json", "v2.metadata.json",
    ]
    for e in log:
        with open(e["metadata-file"]) as f:
            prev = json.load(f)
        assert e["timestamp-ms"] == prev["last-updated-ms"]
        # each version is a complete, self-consistent metadata doc
        assert prev["current-snapshot-id"] in {
            s["snapshot-id"] for s in prev["snapshots"]
        }
    # snapshot-log of the latest covers the full lineage in time order
    ts = [e["timestamp-ms"] for e in doc["snapshot-log"]]
    assert ts == sorted(ts) and len(ts) == 3
