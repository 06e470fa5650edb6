"""catalog.load_table must read BOTH events layouts the driver's testdata
generator has shipped — int64-ns TIMESTAMP(NANOS) and native µs — and
expose an identical (ts µs-NTZ, ts_ns int64-ns) contract for each. The
silent ns→µs generation switch broke 8 event-time queries in round 3;
this pins the equivalence so a future flip either way stays invisible."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


ROWS = [
    (1, 1_704_067_200_123_456_789, 7, "view", 1.5, "{}"),   # 2024-01-01 + ns tail
    (2, 1_704_070_800_000_000_000, 8, "click", 2.5, "{}"),
    (3, 1_706_745_600_999_999_000, 7, "purchase", 3.5, "{}"),
]


def _write_layouts(base):
    ns_dir = base / "ns_layout"
    us_dir = base / "us_layout"
    for d in (ns_dir, us_dir):
        d.mkdir()
    ids, ts_ns, users, types, vals, props = map(list, zip(*ROWS))
    common = {
        "event_id": pa.array(ids, pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    }
    t_ns = pa.table({"event_id": common["event_id"],
                     "ts": pa.array(ts_ns, pa.timestamp("ns")),
                     **{k: common[k] for k in ("user_id", "event_type", "value", "props")}})
    pq.write_table(t_ns, str(ns_dir / "events.parquet"),
                   coerce_timestamps=None, store_schema=False)
    # µs layout: the generator truncates ns → µs at write time
    t_us = pa.table({"event_id": common["event_id"],
                     "ts": pa.array([v // 1000 for v in ts_ns], pa.timestamp("us")),
                     **{k: common[k] for k in ("user_id", "event_type", "value", "props")}})
    pq.write_table(t_us, str(us_dir / "events.parquet"))
    return str(ns_dir), str(us_dir)


def test_both_event_layouts_expose_identical_contract(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.catalog import load_table

    ns_dir, us_dir = _write_layouts(tmp_path)
    a = load_table(spark, ns_dir, "events").orderBy("event_id").collect()
    b = load_table(spark, us_dir, "events").orderBy("event_id").collect()
    assert [r.asDict() for r in a] and len(a) == len(b) == len(ROWS)
    for ra, rb, (eid, ns, *_rest) in zip(a, b, ROWS):
        # ts: µs truncation of the ns value, identical across layouts
        assert ra.ts == rb.ts, (ra, rb)
        # ts_ns: ns-granularity long; layouts may differ only below µs
        assert ra.ts_ns // 1000 == rb.ts_ns // 1000 == ns // 1000
        assert ra.event_id == rb.event_id == eid
    # dtype contract both ways
    for df in (load_table(spark, ns_dir, "events"), load_table(spark, us_dir, "events")):
        dt = dict(df.dtypes)
        assert dt["ts"].startswith("timestamp"), dt
        assert dt["ts_ns"] == "bigint"


def test_ts_ns_is_session_timezone_independent(spark, tmp_path):
    """ts_ns must be byte-identical whether the owning session runs UTC
    (the repo factory) or not (an externally-owned driver session): the
    NTZ-epoch timestampdiff derivation never round-trips through the
    session timezone. Regression for the unix_micros(cast(ntz as
    timestamp)) form, which silently shifted by the tz offset."""
    from emr_apache_iceberg_workshop_spark.catalog import load_table

    _ns_dir, us_dir = _write_layouts(tmp_path)
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    utc = [
        (r.event_id, r.ts_ns)
        for r in load_table(spark, us_dir, "events").orderBy("event_id").collect()
    ]
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = [
            (r.event_id, r.ts_ns)
            for r in load_table(spark, us_dir, "events").orderBy("event_id").collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert shifted == utc
