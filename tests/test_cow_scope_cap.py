"""Cardinality-capped COW partition planning (VERDICT r07 task 3).

Below `write.cow.scope-cap` touched partitions, partition-scoped MERGE /
DELETE / UPDATE collect the touched tuples and inline them (exclusion
lists + OR predicate) — the Iceberg driver-side-planning cost class.
Above the cap — e.g. a wide batch on a `bucket(65536)` spec — the set
must stay DISTRIBUTED: row selection and masking switch to joins against
a parquet mask file (`masks/s{sid}`), so neither driver memory nor the
Catalyst predicate grows with partition cardinality.

These tests run the same DML on a capped table (scope-cap forced tiny)
and an uncapped twin and assert bit-identical table states, plus the
observable proof that the big list never landed driver-side: the capped
snapshot's metadata carries NO inline tuple list, only the mask-file
reference.
"""

from __future__ import annotations

import json
import os

from emr_apache_iceberg_workshop_spark.tables import SnapshotTable


DDL = "id bigint, category string, qty bigint"


def _rows(n, qty0=0):
    return [(i, f"c{i % 16}", qty0 + i) for i in range(n)]


def _mk(spark, rows, ddl=DDL):
    return spark.createDataFrame(rows, ddl)


def _sorted_state(t):
    return sorted((r.id, r.category, r.qty) for r in t.scan().collect())


def _build(spark, root, cap: str | None):
    props = {"write.cow.scope-cap": cap} if cap else {}
    t = SnapshotTable.create(
        spark, root, DDL, partition_by=["bucket(8, id)"], properties=props
    )
    t.write(_mk(spark, _rows(64)).coalesce(2))
    return t


def _head(t) -> dict:
    with open(os.path.join(t.root, "_meta.json")) as f:
        return json.load(f)["snapshots"][-1]


def test_capped_merge_matches_uncapped(spark, tmp_path):
    src = _rows(16, qty0=1000) + [(100, "new", 1), (101, "new", 2)]
    tc = _build(spark, str(tmp_path / "capped"), cap="2")
    tu = _build(spark, str(tmp_path / "plain"), cap=None)
    tc.merge(_mk(spark, src).coalesce(2), keys=["id"])
    tu.merge(_mk(spark, src).coalesce(2), keys=["id"])
    assert _sorted_state(tc) == _sorted_state(tu)
    assert tc.scan().count() == 66

    # capped commit: mask-file plan, no inline tuple list anywhere
    head = _head(tc)
    assert head["summary"]["scope"] == "mask-join"
    assert head["summary"]["scoped_partitions"] > 2
    mask_rel = head["mask_file"]
    assert os.path.isdir(os.path.join(tc.root, mask_rel))
    for e in head["active_dirs"]:
        if isinstance(e, dict):
            assert not e.get("exclude"), "inline tuples leaked above the cap"
            assert mask_rel in e["exclude_masks"]
    # uncapped twin: inline exclusion path, no mask file
    uhead = _head(tu)
    assert "mask_file" not in uhead
    assert any(e.get("exclude") for e in uhead["active_dirs"] if isinstance(e, dict))


def test_capped_then_uncapped_dml_stack(spark, tmp_path):
    """Masked entries survive follow-on DML: an inline-scoped merge on
    top of a mask-scoped one must keep the mask reference, and every
    read path (scan, time travel, .files, emission) stays correct."""
    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        read_data_files,
        write_iceberg_metadata,
    )

    tc = _build(spark, str(tmp_path / "stack"), cap="2")
    tu = _build(spark, str(tmp_path / "stack_u"), cap=None)
    wide = _rows(16, qty0=1000)
    narrow = [(3, "c3", 7777)]
    for t in (tc, tu):
        t.merge(_mk(spark, wide).coalesce(2), keys=["id"])  # capped on tc
        t.merge(_mk(spark, narrow), keys=["id"])  # below any cap
    assert _sorted_state(tc) == _sorted_state(tu)

    head = _head(tc)
    masked = [e for e in head["active_dirs"] if isinstance(e, dict) and e.get("exclude_masks")]
    assert masked, "mask reference dropped by the follow-on merge"

    # time travel to the mask-scoped snapshot
    assert sorted(r.qty for r in tc.scan_at(2).collect() if r.id == 3) == [1003]

    # driver-side metadata paths resolve the mask file
    files = tc.files_table().filter("content = 0").collect()
    assert len(files) == len(tu.files_table().filter("content = 0").collect())

    # native Iceberg emission walks the same masked state
    md = write_iceberg_metadata(tc)
    assert sum(f["record_count"] for f in read_data_files(md)) == tc.scan().count()


def test_capped_delete_where(spark, tmp_path):
    tc = _build(spark, str(tmp_path / "delc"), cap="2")
    tu = _build(spark, str(tmp_path / "delu"), cap=None)
    for t in (tc, tu):
        t.delete_where("qty % 3 = 0")
    assert _sorted_state(tc) == _sorted_state(tu)
    assert _head(tc)["summary"]["scope"] == "mask-join"


def test_expire_keeps_referenced_mask_file(spark, tmp_path):
    t = _build(spark, str(tmp_path / "exp"), cap="2")
    t.merge(_mk(spark, _rows(16, qty0=1000)).coalesce(2), keys=["id"])
    mask_rel = _head(t)["mask_file"]
    before = _sorted_state(t)
    t.write(_mk(spark, [(200, "z", 1)]))
    # expire everything but the head — the mask is still cited by the
    # head's active_dirs entries and must survive
    t.expire_snapshots(keep_last=1)
    assert os.path.isdir(os.path.join(t.root, mask_rel))
    assert _sorted_state(t) == sorted(before + [(200, "z", 1)])
