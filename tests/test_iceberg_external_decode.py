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
