"""End-to-end CDC pipeline test on the reference's deterministic fixture
rows (FIXTURES.md §A; `datagen/raw-datagen.py:88-98`,
`datagen/updates_iceberg.py:89-96`): ingest 5 I rows, then a 2-row U
batch; silver must converge to 5 rows with latest-wins categories
`market####` / `language####` on keys (40994,67) and (83597,37)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from emr_apache_iceberg_workshop_spark.pipelines import (
    BronzeSilverConfig,
    RawBronzeConfig,
    run_bronze_silver,
    run_raw_bronze,
)
from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

HEADER = (
    "Op\treplicadmstimestamp\tinvoiceid\titemid\tcategory\tprice\tquantity"
    "\torderdate\tdestinationstate\tshippingtype\treferral"
)
INITIAL = [
    "I\t2024-02-16 15:30:41.041474\t24137\t34\tdegree\t53.51\t1\t2023-03-29\tSC\t3-Day\tbook",
    "I\t2024-08-20 17:16:03.213831\t15587\t59\tbit\t40.94\t5\t2022-07-16\tPW\t3-Day\tmanagement",
    "I\t2024-10-28 20:02:37.424182\t42918\t69\tschool\t27.23\t3\t2024-04-29\tCT\t2-Day\ttrouble",
    "I\t2024-06-27 14:36:25.103244\t40994\t67\tmarket\t92.02\t1\t2021-05-21\tVI\t2-Day\tothers",
    "I\t2024-02-01 19:52:59.444793\t83597\t37\tlanguage\t97.07\t3\t2021-09-10\tSC\tStandard\tplay",
]
UPDATES = [
    "U\t2024-11-01 10:00:00.000000\t40994\t67\tmarket####\t92.02\t1\t2021-05-21\tVI\t2-Day\tothers",
    "U\t2024-11-01 10:00:01.000000\t83597\t37\tlanguage####\t97.07\t3\t2021-09-10\tSC\tStandard\tplay",
]


def _write_batch(raw_dir: str, name: str, rows: list[str]) -> None:
    os.makedirs(raw_dir, exist_ok=True)
    with open(os.path.join(raw_dir, name), "w") as f:
        f.write(HEADER + "\n" + "\n".join(rows) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return {
        "raw": str(tmp_path / "raw"),
        "bronze": str(tmp_path / "bronze"),
        "silver": str(tmp_path / "silver"),
        "ckpt_rb": str(tmp_path / "ckpt" / "raw_bronze.json"),
        "ckpt_bs": str(tmp_path / "ckpt" / "bronze_silver.json"),
    }


def _cfgs(dirs):
    rb = RawBronzeConfig(
        input_dir=dirs["raw"], table_root=dirs["bronze"], checkpoint_path=dirs["ckpt_rb"]
    )
    bs = BronzeSilverConfig(
        bronze_root=dirs["bronze"], silver_root=dirs["silver"], checkpoint_path=dirs["ckpt_bs"]
    )
    return rb, bs


def test_cdc_end_to_end(spark, dirs):
    rb, bs = _cfgs(dirs)

    # batch 1: 5 inserts
    _write_batch(dirs["raw"], "batch1.csv", INITIAL)
    r1 = run_raw_bronze(spark, rb, clock=datetime(2024, 11, 1, 0, 0, 0))
    assert r1 == {"files": 1, "rows": 5, "snapshot_id": 1, "skipped": False}

    s1 = run_bronze_silver(spark, bs)
    assert not s1["skipped"] and s1["rows"] == 5

    # idempotent no-op: nothing new anywhere
    assert run_raw_bronze(spark, rb)["skipped"]
    assert run_bronze_silver(spark, bs)["skipped"]

    # batch 2: 2 updates (later mtime + later processed_time clock)
    _write_batch(dirs["raw"], "batch2.csv", UPDATES)
    os.utime(os.path.join(dirs["raw"], "batch2.csv"))
    r2 = run_raw_bronze(spark, rb, clock=datetime(2024, 11, 2, 0, 0, 0))
    assert r2["rows"] == 2 and r2["snapshot_id"] == 2

    s2 = run_bronze_silver(spark, bs)
    assert not s2["skipped"] and s2["rows"] == 5  # upsert, not append

    silver = SnapshotTable(spark, dirs["silver"]).scan()
    state = {(r["invoiceid"], r["itemid"]): r["category"] for r in silver.collect()}
    assert len(state) == 5
    assert state[(40994, 67)] == "market####"
    assert state[(83597, 37)] == "language####"
    assert state[(24137, 34)] == "degree"

    # bronze is append-only: both batches retained (7 rows), incremental
    # read of snapshot 2 sees only the update batch
    bronze = SnapshotTable(spark, dirs["bronze"])
    assert bronze.scan().count() == 7
    assert bronze.scan_incremental(1, 2).count() == 2


def test_quality_filter_drops_bad_rows(spark, dirs):
    rb, _ = _cfgs(dirs)
    bad = [
        "I\t2024-02-16 15:30:41.000000\t1\t1\tx\t-5.0\t1\t2023-03-29\tSC\t3-Day\tr",
        "I\t2024-02-16 15:30:42.000000\t2\t1\tx\t10.0\t0\t2023-03-29\tSC\t3-Day\tr",
        "I\t2024-02-16 15:30:43.000000\t3\t1\tx\t10.0\t2\t2023-03-29\tSC\t3-Day\tr",
    ]
    _write_batch(dirs["raw"], "bad.csv", bad)
    r = run_raw_bronze(spark, rb, clock=datetime(2024, 11, 1))
    assert r["rows"] == 1  # price>0 AND quantity>0 (raw-bronze.py:215-216)


def test_silver_partitioned_by_destinationstate(spark, dirs):
    rb, bs = _cfgs(dirs)
    _write_batch(dirs["raw"], "batch1.csv", INITIAL)
    run_raw_bronze(spark, rb, clock=datetime(2024, 11, 1))
    run_bronze_silver(spark, bs)
    # physical layout: hive-style partition dirs under the snapshot dir
    snap_dirs = [
        p for p in os.listdir(os.path.join(dirs["silver"], "data", "s1")) if "=" in p
    ]
    assert sorted(snap_dirs) == ["destinationstate=CT", "destinationstate=PW",
                                 "destinationstate=SC", "destinationstate=VI"]


def test_delete_branch_flag(spark, dirs):
    """C6: Op='D' rows delete matched targets only when apply_deletes=True."""
    rb, bs = _cfgs(dirs)
    bs.apply_deletes = True
    _write_batch(dirs["raw"], "batch1.csv", INITIAL)
    run_raw_bronze(spark, rb, clock=datetime(2024, 11, 1))
    run_bronze_silver(spark, bs)

    delete_row = ["D\t2024-11-03 10:00:00.000000\t24137\t34\tdegree\t53.51\t1\t2023-03-29\tSC\t3-Day\tbook"]
    _write_batch(dirs["raw"], "batch_del.csv", delete_row)
    run_raw_bronze(spark, rb, clock=datetime(2024, 11, 3))
    s = run_bronze_silver(spark, bs)
    assert s["rows"] == 4  # (24137, 34) deleted


def test_s3_lister_pagination_and_watermark(tmp_path):
    """S2 contract (`raw-bronze.py:59-67`): paginated list_objects_v2
    against an injected fake client — files newer than the checkpoint
    survive, pagination is exhausted, watermark advances to max mtime."""
    from datetime import datetime, timezone

    from emr_apache_iceberg_workshop_spark.sources import CheckpointStore
    from emr_apache_iceberg_workshop_spark.sources.incremental_files import (
        IncrementalFileSource,
        S3Lister,
    )

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc)

    class FakePaginator:
        def paginate(self, Bucket, Prefix):
            assert Bucket == "b" and Prefix == "raw/"
            yield {"Contents": [
                {"Key": "raw/a.csv", "LastModified": ts(100)},
                {"Key": "raw/skip.txt", "LastModified": ts(500)},
            ]}
            yield {"Contents": [{"Key": "raw/b.csv", "LastModified": ts(300)}]}
            yield {}  # empty trailing page (no Contents key)

    class FakeClient:
        def get_paginator(self, op):
            assert op == "list_objects_v2"
            return FakePaginator()

    ckpt = CheckpointStore(str(tmp_path / "ckpt.json"))
    src = IncrementalFileSource(
        None, ckpt, lister=S3Lister("b", "raw/", client=FakeClient())
    )
    files, max_seen = src.get_new_files()
    assert files == ["s3://b/raw/a.csv", "s3://b/raw/b.csv"]
    assert max_seen == 300.0

    # advance the watermark past a.csv: only b.csv is new
    ckpt.commit_processed_time(200.0)
    files, max_seen = src.get_new_files()
    assert files == ["s3://b/raw/b.csv"] and max_seen == 300.0


def test_jsonl_source_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL source (sources/jsonl.py): pinned-schema read, corrupt-line
    capture instead of job failure, quarantine feed carries the raw bad
    lines, and a write→read round trip is lossless — including values
    with embedded newlines/tabs/unicode (escaped, so line-splitting is
    safe)."""
    from emr_apache_iceberg_workshop_spark.sources.jsonl import (
        CORRUPT_COL, quarantine_rows, read_jsonl, valid_rows, write_jsonl,
    )

    ddl = "id bigint, text string"
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "text": "plain"}\n'
        '{"id": 2, "text": "new\\nline and tab\\t and \\u00e9"}\n'
        '{"id": 3, "text": "unterminated\n'  # broken: unclosed string
        "garbage line\n"
        '{"id": 4, "text": null}\n',
        encoding="utf-8",
    )
    df = read_jsonl(spark, str(p), ddl)
    ok = {(r.id, r.text) for r in valid_rows(df).collect()}
    assert ok == {(1, "plain"), (2, "new\nline and tab\t and é"), (4, None)}
    bad = sorted(r.raw_line for r in quarantine_rows(df).collect())
    assert bad == sorted(['{"id": 3, "text": "unterminated', "garbage line"])
    # schema declares the capture column exactly once
    assert df.columns.count(CORRUPT_COL) == 1

    # round trip through the writer: escaping keeps one record per line
    out = tmp_path / "out"
    write_jsonl(valid_rows(df), str(out), n_files=1)
    back = {(r.id, r.text) for r in valid_rows(read_jsonl(spark, str(out), ddl)).collect()}
    assert back == ok

    # schema is required and the capture column name is reserved
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_jsonl(spark, str(p), f"id bigint, {CORRUPT_COL} string")
