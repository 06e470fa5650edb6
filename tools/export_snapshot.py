"""Export a SnapshotTable snapshot as vanilla parquet any engine can read.

The reference's core promise is that silver is readable by OTHER engines —
DuckDB discovers the latest Iceberg metadata file and `iceberg_scan`s it
(`read_iceberg_duckdb.py:22-44`), Snowflake maps the table through a catalog
integration (`snowflake/demo.sql:48-54`), StarRocks through an external
catalog (`starocks/mask.sql:19-25`). Our snapshot layout needs `_meta.json`
knowledge, so this tool closes the interop gap the other way: it resolves a
snapshot (masks + MOR deletes applied) and writes a FLAT, hive-partitioned
parquet directory that vanilla `duckdb.read_parquet` / any parquet reader
consumes with no engine-specific extension — plus a generated `view.sql`
(the `starocks/mask.sql` analogue) that casts partition columns back to
their table types.

Scale: the export is one distributed parquet write of the resolved scan —
no collect, no driver materialization; partition pruning carries over to the
external engine via hive partitioning.

Usage:
    python tools/export_snapshot.py <table_root> <out_dir> [snapshot_id]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

_DUCK_TYPES = {
    "string": "VARCHAR",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "short": "SMALLINT",
    "byte": "TINYINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "BLOB",
}


def duck_type(dt: T.DataType) -> str:
    """Spark type → DuckDB type for the generated view's casts."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return duck_type(dt.elementType) + "[]"
    return _DUCK_TYPES.get(dt.simpleString(), "VARCHAR")


def export_snapshot(
    table, out_dir: str, snapshot_id: int | None = None, view_name: str = "exported"
) -> dict:
    """Write the resolved snapshot state under `out_dir/data/` (partitioned
    like the table) and generate `out_dir/view.sql` + `out_dir/export.json`.
    Returns the export manifest."""
    sid = snapshot_id if snapshot_id is not None else table.latest_snapshot_id()
    df = table.scan() if snapshot_id is None else table.scan_at(snapshot_id)
    schema = table.schema() if snapshot_id is None else table.schema_at(snapshot_id)
    from emr_apache_iceberg_workshop_spark.partitioning import field_expr, parse_spec

    fields = parse_spec(table._load()["partition_by"])
    # hidden partitioning: derive the transformed directory columns so the
    # export keeps the table's physical layout; the generated view selects
    # only schema columns, so the derived dirs stay pruning-only
    for pf in fields:
        if pf.transform != "identity":
            df = df.withColumn(pf.name, field_expr(pf, schema))
    part_cols = [pf.name for pf in fields]
    data_dir = os.path.join(out_dir, "data")
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(data_dir)

    # generated view: hive partition columns come back as VARCHAR — cast
    # every column to its table type so the external engine sees the schema
    glob = os.path.join(data_dir, *(["*"] * len(part_cols)), "*.parquet")
    cols = ",\n       ".join(
        f'CAST("{f.name}" AS {duck_type(f.dataType)}) AS "{f.name}"'
        for f in schema.fields
    )
    view_sql = (
        f"CREATE OR REPLACE VIEW {view_name} AS\n"
        f"SELECT {cols}\n"
        f"FROM read_parquet('{glob}', hive_partitioning = true);\n"
    )
    with open(os.path.join(out_dir, "view.sql"), "w") as f:
        f.write(view_sql)

    # Native Iceberg metadata over the table's own files (no copy) — the
    # emitter auto-selects format-version 2 for MOR-delete states, so
    # uncompacted merge-on-read tables are externally readable too — plus
    # the per-engine attach DDL the reference ships by hand. Emission can
    # still refuse (empty table, or active MOR deletes when
    # format_version=1 is forced); those states keep the resolved-parquet
    # export above.
    iceberg_md = None
    if snapshot_id is None:
        from emr_apache_iceberg_workshop_spark.iceberg_meta import (
            external_ddl,
            write_iceberg_metadata,
        )

        try:
            iceberg_md = write_iceberg_metadata(table)
        except ValueError:
            iceberg_md = None
        if iceberg_md:
            for engine, sql in external_ddl(iceberg_md, view_name).items():
                with open(os.path.join(out_dir, f"{engine}.sql"), "w") as f:
                    f.write(sql)

    manifest = {
        "snapshot_id": sid,
        "schema": schema.simpleString()[len("struct<") : -1],
        "partition_by": table._load()["partition_by"],
        "partition_dirs": part_cols,
        "data_glob": glob,
        "view": view_name,
        "iceberg_metadata": iceberg_md,
    }
    with open(os.path.join(out_dir, "export.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    root, out_dir = sys.argv[1], sys.argv[2]
    sid = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from emr_apache_iceberg_workshop_spark.session import build_session
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    spark = build_session("export-snapshot")
    m = export_snapshot(SnapshotTable(spark, root), out_dir, snapshot_id=sid)
    print(json.dumps(m))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
