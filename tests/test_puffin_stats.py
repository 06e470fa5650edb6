"""Puffin statistics files: independent stdlib decode + metadata wiring.

`test_independent_puffin_decode` re-derives the read path from the PUBLIC
specs alone — the Puffin container layout (iceberg.apache.org/puffin-spec:
magic "PFA1", blobs, footer = magic + JSON payload + int32 size + 4 flag
bytes + magic) and the DataSketches compact-theta serial-v3 preamble — with
zero imports from `iceberg_meta`'s reader, the same same-author-pair
mitigation the Avro decoder test applies. The sketch entries are then
verified against a from-scratch md5-KMV recompute of the source rows.
"""

from __future__ import annotations

import json
import os
import struct

import pytest


@pytest.fixture()
def stats_table(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    df = spark.createDataFrame(
        [(i, f"seg{i % 5}", None if i % 10 == 0 else i % 25) for i in range(400)],
        "k long, seg string, nat long",
    )
    t = SnapshotTable.create(spark, str(tmp_path / "t"), df.schema)
    t.write(df, mode="append")
    t.analyze(["k", "seg", "nat"])
    return t


def _decode_puffin_stdlib(path: str):
    """Spec-only Puffin walk: returns (file_metadata, raw_blob_bytes)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"PFA1" and data[-4:] == b"PFA1"
    (psize,) = struct.unpack_from("<i", data, len(data) - 12)
    (flags,) = struct.unpack_from("<i", data, len(data) - 8)
    assert flags == 0  # uncompressed footer payload
    payload_start = len(data) - 12 - psize
    assert data[payload_start - 4 : payload_start] == b"PFA1"
    meta = json.loads(data[payload_start : payload_start + psize].decode())
    blobs = {
        tuple(b["fields"]): data[b["offset"] : b["offset"] + b["length"]]
        for b in meta["blobs"]
    }
    return meta, blobs


def _decode_theta_stdlib(blob: bytes):
    """Spec-only compact-theta decode (serial v3)."""
    pre_longs, ser_ver, family, flags = blob[0], blob[1], blob[2], blob[5]
    assert ser_ver == 3 and family == 3
    assert flags & 0x08 and flags & 0x10  # COMPACT | ORDERED
    if pre_longs == 1:
        return 0, (1 << 63) - 1, []
    (retained,) = struct.unpack_from("<I", blob, 8)
    (theta,) = struct.unpack_from("<q", blob, 16)
    entries = list(struct.unpack_from(f"<{retained}Q", blob, 24))
    assert entries == sorted(entries)
    return retained, theta, entries


def _kmv_md5(values, k=64):
    """From-scratch md5-KMV of a python value list (mirrors what ANALYZE
    computes distributed — int/str rendering matches Spark's CAST)."""
    import hashlib

    hs = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in values
            if v is not None
        }
    )
    return hs[:k]


def test_independent_puffin_decode(stats_table):
    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        iceberg_schema,
        write_iceberg_metadata,
    )

    md_path = write_iceberg_metadata(stats_table)
    with open(md_path) as f:
        doc = json.load(f)
    assert "statistics" in doc and len(doc["statistics"]) == 1
    entry = doc["statistics"][0]
    assert entry["snapshot-id"] == doc["current-snapshot-id"]
    path = entry["statistics-path"]
    assert os.path.getsize(path) == entry["file-size-in-bytes"]

    meta, blobs = _decode_puffin_stdlib(path)
    # footer size bookkeeping: magic + payload + size + flags + magic
    payload_len = entry["file-footer-size-in-bytes"] - 16
    assert payload_len > 0 and len(meta["blobs"]) == 3

    _schema, ids = iceberg_schema(stats_table.schema())
    rows = stats_table.scan().select("k", "seg", "nat").collect()
    cols = {"k": [r[0] for r in rows], "seg": [r[1] for r in rows],
            "nat": [r[2] for r in rows]}
    for col, values in cols.items():
        blob_meta = next(b for b in meta["blobs"] if b["fields"] == [ids[col]])
        assert blob_meta["type"] == "apache-datasketches-theta-v1"
        retained, theta, entries = _decode_theta_stdlib(blobs[(ids[col],)])
        kmv = _kmv_md5(values)
        if len(kmv) >= 64:  # estimation mode: k-th value became theta
            assert theta == kmv[-1] * 8
            assert entries == [h * 8 for h in kmv[:-1]]
        else:  # exact mode
            assert theta == (1 << 63) - 1
            assert entries == [h * 8 for h in kmv]
        # the interop surface: the ndv property estimates within KMV error
        ndv = int(blob_meta["properties"]["ndv"])
        exact = len({v for v in values if v is not None})
        assert abs(ndv - exact) <= max(3, exact // 3)

    # blob-metadata mirrored into table metadata (sans offsets, per spec)
    for b in entry["blob-metadata"]:
        assert "offset" not in b and "ndv" in b["properties"]


def test_puffin_reader_roundtrip(stats_table):
    """The module's own reader agrees with what it wrote (the query path)."""
    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        iceberg_schema,
        read_puffin_stats,
        write_iceberg_metadata,
    )

    md_path = write_iceberg_metadata(stats_table)
    with open(md_path) as f:
        doc = json.load(f)
    got = read_puffin_stats(doc["statistics"][0]["statistics-path"])
    _schema, ids = iceberg_schema(stats_table.schema())
    assert set(got["by_field"]) == {ids["k"], ids["seg"], ids["nat"]}
    seg = got["by_field"][ids["seg"]]["sketch"]
    assert seg["retained"] == 5 and seg["estimate"] == 5


def test_theta_empty_and_exact_modes():
    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        _theta_decode,
        _theta_sketch_bytes,
    )

    empty = _theta_decode(_theta_sketch_bytes([], 64))
    assert empty["retained"] == 0 and empty["estimate"] == 0
    exact = _theta_decode(_theta_sketch_bytes([10, 20, 30], 64))
    assert exact["retained"] == 3 and exact["estimate"] == 3
    est = _theta_decode(_theta_sketch_bytes(list(range(1, 65)), 64))
    assert est["retained"] == 63 and est["theta"] == 64 * 8


def test_no_stats_no_statistics_field(spark, tmp_path):
    """Tables that never ran ANALYZE emit metadata without a statistics
    entry (and without an orphan puffin file)."""
    from emr_apache_iceberg_workshop_spark.iceberg_meta import write_iceberg_metadata
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    df = spark.range(5).selectExpr("id AS k")
    t = SnapshotTable.create(spark, str(tmp_path / "plain"), df.schema)
    t.write(df, mode="append")
    md_path = write_iceberg_metadata(t)
    with open(md_path) as f:
        doc = json.load(f)
    assert "statistics" not in doc
    meta_dir = os.path.dirname(md_path)
    assert not [p for p in os.listdir(meta_dir) if p.endswith(".puffin")]


def test_stats_follow_rename_and_drop(spark, tmp_path):
    """Stats are conceptually field-id-keyed (Iceberg): a rename carries
    the column's stats to the new name (and the emitted Puffin blob keeps
    the field id); a drop removes them, so a re-added column of the same
    name cannot inherit stale stats."""
    import json as _json

    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        iceberg_schema,
        read_puffin_stats,
        write_iceberg_metadata,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "k long, grp long"
    )
    t = SnapshotTable.create(spark, str(tmp_path / "t"), df.schema)
    t.write(df, mode="append")
    t.analyze(["k", "grp"])
    t.rename_column("grp", "bucket_id")
    props = t.properties()
    assert "stats.grp" not in props and "stats.bucket_id" in props
    s = _json.loads(props["stats.bucket_id"])
    assert s["sample_size"] == 7  # the 7 distinct grp values travelled over

    md_path = write_iceberg_metadata(t)
    with open(md_path) as f:
        doc = _json.load(f)
    _schema, ids = iceberg_schema(t.schema())
    puffin = read_puffin_stats(doc["statistics"][0]["statistics-path"])
    assert puffin["by_field"][ids["bucket_id"]]["sketch"]["estimate"] == 7

    t.evolve_schema(drop=["bucket_id"])
    assert "stats.bucket_id" not in t.properties()
    t.evolve_schema(add={"bucket_id": "bigint"})
    assert "stats.bucket_id" not in t.properties()  # no stale inheritance
