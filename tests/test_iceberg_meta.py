"""Native Iceberg v1 metadata emission (S17): the snapshot table becomes
readable by external engines straight off `<root>/metadata/vN.metadata.json`
— the reference's interop contract (`read_iceberg_duckdb.py:22-44,61`:
discover latest metadata json, `iceberg_scan` it). The sandbox has no
Iceberg-enabled external engine (DuckDB's iceberg extension needs a
network install), so these tests drive the same chain an external reader
does: metadata.json → manifest list (Avro) → manifest (Avro) → data files
→ parquet scan, and cross-check the result row-for-row against `scan()`
via DuckDB's parquet reader."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from emr_apache_iceberg_workshop_spark.iceberg_meta import (
    iceberg_schema,
    read_avro_container,
    read_data_files,
    write_avro_container,
    write_iceberg_metadata,
)
from emr_apache_iceberg_workshop_spark.tables import SnapshotTable


def test_avro_container_roundtrip(tmp_path):
    """The hand-rolled Avro object-container writer/decoder agree on every
    construct the Iceberg metadata files use: records, [null, T] unions,
    arrays, maps, all primitive types."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "a", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {
                "name": "r",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": ["null", "string"]}],
                },
            },
        ],
    }
    records = [
        {"l": -(2**62), "i": -1, "s": "héllo", "b": b"\x00\xff", "f": True,
         "d": 1.5, "u": None, "a": ["p", "q"], "m": {"k1": 7, "k2": -7},
         "r": {"x": "y"}},
        {"l": 2**62, "i": 0, "s": "", "b": b"", "f": False, "d": -0.25,
         "u": 42, "a": [], "m": {}, "r": {"x": None}},
    ]
    p = str(tmp_path / "t.avro")
    n = write_avro_container(p, schema, records, meta={"k": "v"})
    assert n == os.path.getsize(p)
    got_schema, got_meta, got = read_avro_container(p)
    assert got_schema == schema
    assert got_meta["k"] == b"v"
    assert got == records


def _build_table(spark, root: str) -> SnapshotTable:
    """Partitioned table with two appends and a partition-scoped COW merge,
    so the live-file set exercises exclusion masks (a rewritten partition's
    old files must NOT appear in the emitted manifest)."""
    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(spark, root, ddl, partition_by=["category"])
    t.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)], ddl
        ).coalesce(1)
    )
    t.write(spark.createDataFrame([(5, "c", 50), (6, "c", 60)], ddl).coalesce(1))
    t.merge(
        spark.createDataFrame([(2, "a", 21), (7, "d", 70)], ddl).coalesce(1),
        keys=["id"],
    )
    return t


def test_emitted_metadata_chain_matches_scan(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "ice"))
    md_path = write_iceberg_metadata(t)

    # --- metadata.json: spec-required v1 keys, discoverable layout -------
    with open(md_path) as f:
        doc = json.load(f)
    for key in (
        "format-version", "table-uuid", "location", "last-column-id", "schema",
        "partition-spec", "current-snapshot-id", "snapshots",
    ):
        assert key in doc, key
    assert doc["format-version"] == 1
    assert doc["schema"]["fields"][0] == {
        "id": 1, "name": "id", "required": False, "type": "long"
    }
    assert doc["partition-spec"] == [
        {"name": "category", "transform": "identity", "source-id": 2, "field-id": 1000}
    ]
    meta_dir = os.path.dirname(md_path)
    hint = open(os.path.join(meta_dir, "version-hint.text")).read()
    assert md_path.endswith(f"v{hint}.metadata.json")
    # lexicographic discovery like read_iceberg_duckdb.py:35-37
    jsons = sorted(n for n in os.listdir(meta_dir) if n.endswith(".metadata.json"))
    assert os.path.join(meta_dir, jsons[-1]) == md_path

    # --- manifest chain: external-reader walk = engine's live files ------
    files = read_data_files(md_path)
    assert all(f["file_format"] == "PARQUET" for f in files)
    got_paths = {f["file_path"] for f in files}
    want_paths = {
        os.path.join(os.path.abspath(t.root), f["path"]) for _r, f in t._live_files()
    }
    assert got_paths == want_paths
    # the masked partition (category=a rewritten by the merge) appears once
    cat_a = [f for f in files if f["partition"] == {"category": "a"}]
    assert len(cat_a) == len({f["file_path"] for f in cat_a})

    # --- manifest stats: record counts match the parquet footers ---------
    snap = next(
        s for s in doc["snapshots"] if s["snapshot-id"] == doc["current-snapshot-id"]
    )
    _, mmeta, manifests = read_avro_container(snap["manifest-list"])
    assert mmeta["format-version"] == b"1"
    assert sum(m["added_rows_count"] for m in manifests) == sum(
        f["record_count"] for f in files
    )

    # --- data: reading the listed files = scan(), row for row ------------
    con = duckdb.connect()
    paths = sorted(got_paths)
    rows_duck = con.execute(
        "SELECT id, qty FROM read_parquet(?) ORDER BY id", [paths]
    ).fetchall()
    rows_spark = [
        (r.id, r.qty) for r in t.scan().select("id", "qty").orderBy("id").collect()
    ]
    assert rows_duck == rows_spark
    assert {r[0] for r in rows_spark} == {1, 2, 3, 4, 5, 6, 7}
    # the partition values in the manifest agree with the hive dirs
    assert {f["partition"]["category"] for f in files} == {"a", "b", "c", "d"}


def test_mor_deletes_auto_v2_v1_refuses_compact_folds(spark, tmp_path):
    """A MOR-delete state emits format-version 2 automatically (delete
    manifests carry the equality-delete file); forcing v1 refuses; after
    compact() the auto choice drops back to v1 and the plain data-file
    chain serves the folded state."""
    import json

    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, str(tmp_path / "mor"), ddl,
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
    t.merge(spark.createDataFrame([(2, "b2")], ddl), keys=["id"])
    with pytest.raises(ValueError, match="merge-on-read"):
        write_iceberg_metadata(t, format_version=1)
    md2 = write_iceberg_metadata(t)
    with open(md2) as f:
        doc = json.load(f)
    assert doc["format-version"] == 2
    assert doc["last-sequence-number"] == 2
    from emr_apache_iceberg_workshop_spark.iceberg_meta import read_table_chain

    chain = read_table_chain(md2)
    assert chain["format_version"] == 2
    # head snapshot: data files from both commits, one equality delete
    assert {e["sequence_number"] for e in chain["data"]} == {1, 2}
    assert [d["content"] for d in chain["deletes"]] == [2]
    assert chain["deletes"][0]["equality_ids"] == [1]  # id is field 1
    assert chain["deletes"][0]["sequence_number"] == 2

    t.compact(target_partitions=1)
    md = write_iceberg_metadata(t)
    with open(md) as f:
        assert json.load(f)["format-version"] == 1
    files = read_data_files(md)
    import duckdb as dk

    rows = dk.connect().execute(
        "SELECT id, v FROM read_parquet(?) ORDER BY id",
        [sorted(f["file_path"] for f in files)],
    ).fetchall()
    assert rows == [(1, "a"), (2, "b2")]


def test_manifest_entries_carry_column_bounds(spark, tmp_path):
    """Emitted manifests carry Iceberg lower/upper bounds maps (field-id
    → single-value serialization, spec Appendix D) for every stats-backed
    column — including timestamps, written as int64 micros so parquet
    stats exist at all — enabling external file pruning."""
    import datetime as dt
    import struct

    from emr_apache_iceberg_workshop_spark.iceberg_meta import read_avro_container

    ddl = "id bigint, name string, ts timestamp, price double"
    t = SnapshotTable.create(spark, str(tmp_path / "bounds"), ddl)
    rows = [
        (1, "alpha", dt.datetime(2024, 1, 2, 3, 4, 5), 1.5),
        (9, "zeta", dt.datetime(2024, 2, 2), 9.75),
    ]
    t.write(spark.createDataFrame(rows, ddl).coalesce(1))
    md = write_iceberg_metadata(t)
    import json

    with open(md) as f:
        doc = json.load(f)
    _, _, mlist = read_avro_container(doc["snapshots"][-1]["manifest-list"])
    _, _, entries = read_avro_container(mlist[0]["manifest_path"])
    df_ = entries[0]["data_file"]
    lb = {e["key"]: e["value"] for e in df_["lower_bounds"]}
    ub = {e["key"]: e["value"] for e in df_["upper_bounds"]}
    assert sorted(lb) == [1, 2, 3, 4]  # every column has bounds
    assert struct.unpack("<q", lb[1])[0] == 1 and struct.unpack("<q", ub[1])[0] == 9
    assert lb[2] == b"alpha" and ub[2] == b"zeta"
    epoch = dt.datetime(1970, 1, 1)
    want_lo = int((dt.datetime(2024, 1, 2, 3, 4, 5) - epoch).total_seconds() * 1_000_000)
    want_hi = int((dt.datetime(2024, 2, 2) - epoch).total_seconds() * 1_000_000)
    assert struct.unpack("<q", lb[3])[0] == want_lo
    assert struct.unpack("<q", ub[3])[0] == want_hi
    assert struct.unpack("<d", lb[4])[0] == 1.5
    assert struct.unpack("<d", ub[4])[0] == 9.75
    # value/null counts + split offsets (Iceberg field-ids 109/110/132)
    vc = {e["key"]: e["value"] for e in df_["value_counts"]}
    assert vc == {1: 2, 2: 2, 3: 2, 4: 2}
    nvc = {e["key"]: e["value"] for e in df_["null_value_counts"]}
    assert nvc == {1: 0, 2: 0, 3: 0, 4: 0}
    assert df_["split_offsets"] and df_["split_offsets"][0] >= 4


def test_v2_mor_chain_structure_and_reconstruction(spark, tmp_path):
    """v2 emission of a partitioned MOR state with BOTH delete styles:
    delete manifests declare the unpartitioned spec (global deletes), the
    positional delete file is re-emitted in the spec's (file_path, pos)
    shape sorted, sequence numbers equal commit ids, and replaying the
    chain per spec reproduces scan()."""
    import json

    import pyarrow.parquet as pq

    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        read_avro_container,
        read_table_chain,
    )

    ddl = "id bigint, category string, qty bigint"
    t = SnapshotTable.create(
        spark, str(tmp_path / "v2"), ddl, partition_by=["category"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    rows1 = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)]
    t.write(spark.createDataFrame(rows1, ddl).coalesce(1).sortWithinPartitions("id"))
    t.merge(spark.createDataFrame([(2, "a", 22), (9, "b", 90)], ddl).coalesce(1), keys=["id"])
    t.set_properties(
        {"write.delete.mode": "merge-on-read", "write.delete.style": "position"}
    )
    t.delete_where("qty = 90")
    md = write_iceberg_metadata(t)
    with open(md) as f:
        doc = json.load(f)
    assert doc["format-version"] == 2
    assert doc["last-sequence-number"] == 3
    assert {s["spec-id"] for s in doc["partition-specs"]} == {0, 1}
    assert doc["partition-specs"][1]["fields"] == []
    head = next(s for s in doc["snapshots"] if s["snapshot-id"] == 3)
    assert head["sequence-number"] == 3
    _, _, mlist = read_avro_container(head["manifest-list"])
    dm = [m for m in mlist if m["content"] == 1]
    assert len(dm) == 1 and dm[0]["partition_spec_id"] == 1
    assert dm[0]["min_sequence_number"] == 2 and dm[0]["sequence_number"] == 3

    chain = read_table_chain(md)
    by_content = {}
    for d in chain["deletes"]:
        by_content.setdefault(d["content"], []).append(d)
    assert set(by_content) == {1, 2}
    # conforming positional delete file: absolute data paths, sorted
    pos_file = by_content[1][0]["data_file"]["file_path"]
    tbl = pq.read_table(pos_file)
    assert tbl.column_names == ["file_path", "pos"]
    pairs = list(zip(tbl.column("file_path").to_pylist(), tbl.column("pos").to_pylist()))
    assert pairs == sorted(pairs)
    data_paths = {e["data_file"]["file_path"] for e in chain["data"]}
    assert all(p in data_paths for p, _ in pairs)
    # equality delete: id field, seq = merge commit
    eq = by_content[2][0]
    assert eq["equality_ids"] == [1] and eq["sequence_number"] == 2

    # spec replay == scan()
    import duckdb as dk

    con = dk.connect()
    legs = []
    for e in chain["data"]:
        df_ = e["data_file"]
        legs.append(
            f"SELECT id, '{df_['partition']['category']}' AS category, qty, "
            f"CAST({e['sequence_number']} AS BIGINT) AS seq, "
            f"'{df_['file_path']}' AS path, "
            f"(row_number() OVER () - 1) AS pos "
            f"FROM read_parquet('{df_['file_path']}')"
        )
    # DuckDB row_number over a single parquet preserves file order
    state = " UNION ALL ".join(f"({x})" for x in legs)
    got = con.execute(
        f"""
        WITH d AS ({state}),
             pd AS (SELECT * FROM read_parquet('{pos_file}')),
             ed AS (SELECT id AS del_id FROM read_parquet(
                        '{eq["data_file"]["file_path"]}'))
        SELECT id, category, qty FROM d
        WHERE NOT EXISTS (SELECT 1 FROM pd
                          WHERE pd.file_path = d.path AND pd.pos = d.pos)
          AND NOT (d.seq < {eq['sequence_number']}
                   AND d.id IN (SELECT del_id FROM ed))
        ORDER BY id
        """
    ).fetchall()
    want = sorted((r.id, r.category, r.qty) for r in t.scan().collect())
    assert got == want == [(1, "a", 10), (2, "a", 22), (3, "b", 30), (4, "b", 40)]


def test_reemission_bumps_version(spark, tmp_path):
    ddl = "id bigint, v string"
    t = SnapshotTable.create(spark, str(tmp_path / "vers"), ddl)
    t.write(spark.createDataFrame([(1, "a")], ddl))
    p1 = write_iceberg_metadata(t)
    t.write(spark.createDataFrame([(2, "b")], ddl))
    p2 = write_iceberg_metadata(t)
    assert p1.endswith("v1.metadata.json") and p2.endswith("v2.metadata.json")
    hint = open(os.path.join(os.path.dirname(p2), "version-hint.text")).read()
    assert hint == "2"
    # new metadata sees both rows through the chain
    assert sum(f["record_count"] for f in read_data_files(p2)) == 2
    # metadata-log records the superseded metadata file (Iceberg shape)
    import json

    with open(p2) as f:
        log = json.load(f)["metadata-log"]
    assert [e["metadata-file"] for e in log] == [p1]


def test_forced_v2_time_travels_through_mor_history(spark, tmp_path):
    """format_version=2 forced on a compacted table emits the FULL
    history including the mid-history MOR snapshot (v1 must skip it),
    and replaying the v2 chain at that snapshot reproduces scan_at."""
    import json

    from emr_apache_iceberg_workshop_spark.iceberg_meta import read_table_chain

    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, str(tmp_path / "fv2"), ddl,
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ddl).coalesce(1))
    mor_sid = t.merge(spark.createDataFrame([(2, "b2"), (3, "c")], ddl).coalesce(1), keys=["id"])
    t.compact(target_partitions=1)
    md1 = write_iceberg_metadata(t)  # auto: v1, MOR snapshot skipped
    with open(md1) as f:
        doc1 = json.load(f)
    assert doc1["format-version"] == 1
    assert mor_sid not in {s["snapshot-id"] for s in doc1["snapshots"]}

    md2 = write_iceberg_metadata(t, format_version=2)
    with open(md2) as f:
        doc2 = json.load(f)
    assert doc2["format-version"] == 2
    assert mor_sid in {s["snapshot-id"] for s in doc2["snapshots"]}
    chain = read_table_chain(md2, snapshot_id=mor_sid)
    assert [d["content"] for d in chain["deletes"]] == [2]
    # replay the MOR point: data rows minus equality-delete on older seqs
    import duckdb as dk

    con = dk.connect()
    legs = " UNION ALL ".join(
        f"(SELECT id, v, CAST({e['sequence_number']} AS BIGINT) AS seq "
        f"FROM read_parquet('{e['data_file']['file_path']}'))"
        for e in chain["data"]
    )
    eq = chain["deletes"][0]
    got = con.execute(
        f"""
        WITH d AS ({legs}),
             ed AS (SELECT id AS del_id
                    FROM read_parquet('{eq["data_file"]["file_path"]}'))
        SELECT id, v FROM d
        WHERE NOT (d.seq < {eq['sequence_number']}
                   AND d.id IN (SELECT del_id FROM ed))
        ORDER BY id
        """
    ).fetchall()
    want = sorted((r.id, r.v) for r in t.scan_at(mor_sid).collect())
    assert got == want == [(1, "a"), (2, "b2"), (3, "c")]


def test_external_ddl_golden():
    """The generated attach-DDL for each external engine matches the
    checked-in golden files (reference parity: `snowflake/demo.sql:28-51`,
    `starocks/mask.sql:5-17`, `read_iceberg_duckdb.py:61`)."""
    from emr_apache_iceberg_workshop_spark.iceberg_meta import external_ddl

    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    ddl = external_ddl("/warehouse/silver/metadata/v3.metadata.json", "silver_orders")
    assert set(ddl) == {"duckdb", "snowflake", "starrocks"}
    for engine, sql in ddl.items():
        with open(os.path.join(golden_dir, f"ddl_{engine}.sql")) as f:
            assert sql == f.read(), engine


def test_export_tool_emits_iceberg_and_ddl(spark, tmp_path):
    """export_snapshot on a COW table also writes native Iceberg metadata
    (in-place, under the TABLE root) + the three engine DDL files in the
    export dir; the manifest records the metadata path."""
    from tools.export_snapshot import export_snapshot

    ddl = "id bigint, v string"
    t = SnapshotTable.create(spark, str(tmp_path / "cow"), ddl)
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
    out = str(tmp_path / "exp")
    manifest = export_snapshot(t, out, view_name="silver")
    md = manifest["iceberg_metadata"]
    assert md and os.path.exists(md)
    assert os.path.dirname(md) == os.path.join(os.path.abspath(t.root), "metadata")
    for engine in ("duckdb", "snowflake", "starrocks"):
        with open(os.path.join(out, f"{engine}.sql")) as f:
            assert "iceberg" in f.read().lower()
    assert sum(f["record_count"] for f in read_data_files(md)) == 2


def test_v2_emission_with_rename_and_deletes_combined(spark, tmp_path):
    """The hard combination: a RENAMED column AND an active MOR equality
    delete keyed on it. Emission produces v2 (delete manifests) PLUS the
    name-mapping property, and resolving both reconstructs scan()."""
    import json

    from emr_apache_iceberg_workshop_spark.iceberg_meta import read_table_chain

    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, str(tmp_path / "combo"), ddl,
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ddl).coalesce(1))
    t.compact(target_partitions=1)  # fold nothing; keeps rename legal
    t.rename_column("v", "val")
    t.write(spark.createDataFrame([(3, "c")], "id bigint, val string").coalesce(1))
    t.merge(spark.createDataFrame([(2, "b2")], "id bigint, val string"), keys=["id"])
    md = write_iceberg_metadata(t)
    with open(md) as f:
        doc = json.load(f)
    assert doc["format-version"] == 2
    nm = {e["field-id"]: sorted(e["names"]) for e in json.loads(
        doc["properties"]["schema.name-mapping.default"])}
    val_id = next(f["id"] for f in doc["schema"]["fields"] if f["name"] == "val")
    assert nm[val_id] == ["v", "val"]
    chain = read_table_chain(md)
    assert [d["content"] for d in chain["deletes"]] == [2]
    assert chain["deletes"][0]["equality_ids"] == [1]
    # replay with name resolution: every data file read under whichever
    # mapped name it physically carries, deletes applied per seq rule
    import duckdb as dk
    import pyarrow.parquet as pq

    legs = []
    for e in chain["data"]:
        path = e["data_file"]["file_path"]
        phys = set(pq.ParquetFile(path).schema_arrow.names)
        vcol = "val" if "val" in phys else "v"
        legs.append(
            f"(SELECT id, {vcol} AS val, CAST({e['sequence_number']} AS BIGINT) AS seq "
            f"FROM read_parquet('{path}'))"
        )
    eq = chain["deletes"][0]
    got = dk.connect().execute(
        f"""
        WITH d AS ({' UNION ALL '.join(legs)}),
             ed AS (SELECT id AS del_id
                    FROM read_parquet('{eq["data_file"]["file_path"]}'))
        SELECT id, val FROM d
        WHERE NOT (d.seq < {eq['sequence_number']}
                   AND d.id IN (SELECT del_id FROM ed))
        ORDER BY id
        """
    ).fetchall()
    want = sorted((r.id, r.val) for r in t.scan().collect())
    assert got == want == [(1, "a"), (2, "b2"), (3, "c")]


def test_export_tool_emits_v2_for_mor_state(spark, tmp_path):
    """export_snapshot on an UNCOMPACTED merge-on-read table now emits
    native metadata too (format-version 2) — the reference's silver
    shape, externally attachable without compact()."""
    import json

    from tools.export_snapshot import export_snapshot

    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, str(tmp_path / "mor"), ddl,
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
    t.merge(spark.createDataFrame([(2, "b2")], ddl), keys=["id"])
    manifest = export_snapshot(t, str(tmp_path / "exp"), view_name="silver")
    md = manifest["iceberg_metadata"]
    assert md and os.path.exists(md)
    with open(md) as f:
        assert json.load(f)["format-version"] == 2


def test_iceberg_schema_types(spark):
    from pyspark.sql import types as T

    st = T.StructType(
        [
            T.StructField("s", T.StringType(), True),
            T.StructField("ts", T.TimestampNTZType(), True),
            T.StructField("d", T.DateType(), False),
            T.StructField("emb", T.ArrayType(T.FloatType(), False), True),
        ]
    )
    sch, ids = iceberg_schema(st)
    by_name = {f["name"]: f for f in sch["fields"]}
    assert by_name["ts"]["type"] == "timestamp"
    assert by_name["d"]["required"] is True
    assert by_name["emb"]["type"]["type"] == "list"
    assert by_name["emb"]["type"]["element"] == "float"
    assert by_name["emb"]["type"]["element-required"] is True
    assert ids == {"s": 1, "ts": 2, "d": 3, "emb": 4}


def test_multi_snapshot_metadata_time_travel(spark, tmp_path):
    """Every representable snapshot gets its own manifest chain: external
    readers time-travel (`FOR VERSION AS OF`) to any of them, matching
    `scan_at`; mid-history MOR states are omitted (no v1 representation)
    while the post-compaction state is present."""
    import duckdb

    ddl = "id bigint, v string"
    t = SnapshotTable.create(spark, str(tmp_path / "tt"), ddl)
    t.write(spark.createDataFrame([(1, "a")], ddl))
    t.write(spark.createDataFrame([(2, "b")], ddl))
    t.write(spark.createDataFrame([(3, "c")], ddl))
    md = write_iceberg_metadata(t)
    with open(md) as f:
        doc = json.load(f)
    assert [s["snapshot-id"] for s in doc["snapshots"]] == [1, 2, 3]
    assert doc["snapshots"][1]["parent-snapshot-id"] == 1
    assert doc["current-snapshot-id"] == 3
    con = duckdb.connect()
    for sid, want_ids in ((1, {1}), (2, {1, 2}), (3, {1, 2, 3})):
        paths = sorted(f["file_path"] for f in read_data_files(md, snapshot_id=sid))
        got = {r[0] for r in con.execute("SELECT id FROM read_parquet(?)", [paths]).fetchall()}
        assert got == want_ids == {r.id for r in t.scan_at(sid).collect()}

    # MOR history: pre-compaction merge snapshots are skipped, the
    # compacted current state is emitted
    t2 = SnapshotTable.create(
        spark, str(tmp_path / "tt_mor"), ddl,
        properties={"write.merge.mode": "merge-on-read"},
    )
    t2.write(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
    t2.merge(spark.createDataFrame([(2, "b2")], ddl), keys=["id"])
    t2.compact(target_partitions=1)
    md2 = write_iceberg_metadata(t2)
    with open(md2) as f:
        doc2 = json.load(f)
    sids = [s["snapshot-id"] for s in doc2["snapshots"]]
    assert 2 not in sids and doc2["current-snapshot-id"] == 3
    paths = sorted(f["file_path"] for f in read_data_files(md2))
    rows = con.execute("SELECT id, v FROM read_parquet(?) ORDER BY id", [paths]).fetchall()
    assert rows == [(1, "a"), (2, "b2")]


def test_emission_covers_main_lineage_only_and_multi_spec(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable
    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        read_avro_container,
        read_table_chain,
        write_iceberg_metadata,
    )
    import json

    ddl = "id bigint, category string"
    mk = lambda rows: spark.createDataFrame(rows, ddl).coalesce(1)  # noqa: E731

    # staged-branch snapshots stay out of the published metadata
    t = SnapshotTable.create(spark, str(tmp_path / "b"), ddl)
    t.write(mk([(1, "a")]))
    t.write(mk([(2, "b")]), branch="audit")  # unpublished
    p = write_iceberg_metadata(t)
    doc = json.load(open(p))
    assert [s["snapshot-id"] for s in doc["snapshots"]] == [1]
    assert doc["current-snapshot-id"] == 1

    # a mixed-spec live state emits MULTI-SPEC metadata (Iceberg
    # partition-spec evolution): each dir's files go into a manifest of
    # the spec current at their commit, partition-specs declares both,
    # default-spec-id is the current spec
    t2 = SnapshotTable.create(
        spark, str(tmp_path / "s"), ddl + ", part string", partition_by=["part"]
    )
    mk2 = lambda rows: spark.createDataFrame(rows, ddl + ", part string").coalesce(1)  # noqa: E731
    t2.write(mk2([(1, "a", "x")]))
    t2.evolve_partition_spec(["category"])
    t2.write(mk2([(2, "b", "y")]))
    p2 = write_iceberg_metadata(t2)
    doc2 = json.load(open(p2))
    assert doc2["current-snapshot-id"] == t2.latest_snapshot_id()
    specs = {s["spec-id"]: [f["name"] for f in s["fields"]] for s in doc2["partition-specs"]}
    assert specs == {0: ["category"], 1: ["part"]}
    assert doc2["default-spec-id"] == 0
    # distinct partition field ids across specs (shared registry)
    fids = [f["field-id"] for s in doc2["partition-specs"] for f in s["fields"]]
    assert sorted(fids) == [1000, 1001]
    head = next(
        s for s in doc2["snapshots"]
        if s["snapshot-id"] == doc2["current-snapshot-id"]
    )
    _, _, mlist = read_avro_container(head["manifest-list"])
    by_spec = {m["partition_spec_id"]: m for m in mlist}
    assert set(by_spec) == {0, 1}
    # chain read resolves every live file with its own spec's partition
    chain = read_table_chain(p2)
    parts = sorted(
        tuple(sorted(e["data_file"]["partition"].items())) for e in chain["data"]
    )
    assert parts == [(("category", "b"),), (("part", "x"),)]
    # compaction folds to a single-spec state; emission keeps both specs
    # declared but the live manifests are current-spec only
    t2.compact(target_partitions=1)
    p3 = write_iceberg_metadata(t2)
    doc3 = json.load(open(p3))
    head3 = next(
        s for s in doc3["snapshots"]
        if s["snapshot-id"] == doc3["current-snapshot-id"]
    )
    _, _, mlist3 = read_avro_container(head3["manifest-list"])
    assert {m["partition_spec_id"] for m in mlist3} == {0}


def test_sort_order_emitted_from_write_order(spark, tmp_path):
    """`WRITE ORDERED BY` (write.sort-order property) surfaces as a real
    Iceberg sort order: order-id 1, identity/asc/nulls-first fields by
    field id, default-sort-order-id updated; unordered tables keep the
    spec's empty order 0."""
    import json

    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        iceberg_schema,
        write_iceberg_metadata,
    )
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    df = spark.createDataFrame([(1, "a", 2)], "k long, s string, v long")
    t = SnapshotTable.create(spark, str(tmp_path / "t"), df.schema)
    t.write(df, mode="append")

    with open(write_iceberg_metadata(t)) as f:
        doc = json.load(f)
    assert doc["default-sort-order-id"] == 0
    assert doc["sort-orders"] == [{"order-id": 0, "fields": []}]

    t.set_properties({"write.sort-order": "k, v"})
    with open(write_iceberg_metadata(t)) as f:
        doc = json.load(f)
    _schema, ids = iceberg_schema(t.schema())
    assert doc["default-sort-order-id"] == 1
    assert doc["sort-orders"][1]["fields"] == [
        {"transform": "identity", "source-id": ids["k"],
         "direction": "asc", "null-order": "nulls-first"},
        {"transform": "identity", "source-id": ids["v"],
         "direction": "asc", "null-order": "nulls-first"},
    ]
