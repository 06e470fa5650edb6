"""SQL-façade fuzz: random DML sequences through `SqlCatalog.sql` TEXT
(INSERT VALUES / DELETE WHERE / UPDATE SET / MERGE INTO / metadata-only
property flips) against an in-python row model — the grammar→executor
binding is the surface under test, complementing the library-API fuzz in
test_table_model.py. COW and MOR execution modes interleave via SET
TBLPROPERTIES so both DML engines face the same statement stream."""

from __future__ import annotations

import random

import pytest

SEEDS = (11, 47, 308)
STEPS = 16
DDL = "id BIGINT, grade STRING, qty BIGINT"


def _mk_rows(rng: random.Random, n: int, hi: int = 40):
    return [
        (rng.randrange(hi), rng.choice("abcde"), rng.randrange(100))
        for _ in range(n)
    ]


def _values_sql(rows) -> str:
    return ", ".join(f"({i}, '{g}', {q})" for i, g, q in rows)


def _run_sql_model(spark, tmp_path, seed: int) -> None:
    from emr_apache_iceberg_workshop_spark.sqlext import SqlCatalog
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    rng = random.Random(seed)
    cat = SqlCatalog(spark)
    name = f"fz{seed}"
    root = str(tmp_path / name)
    SnapshotTable.create(spark, root, DDL)
    cat.register(name, root)
    model: list[tuple] = []

    for step in range(STEPS):
        op = rng.choice(
            ["insert", "insert", "delete", "update", "merge", "mode_flip"]
        )
        if op == "insert":
            rows = _mk_rows(rng, rng.randrange(1, 5))
            cat.sql(f"INSERT INTO {name} VALUES {_values_sql(rows)}")
            model += rows
        elif op == "delete":
            lo = rng.randrange(0, 40)
            cat.sql(f"DELETE FROM {name} WHERE id >= {lo} AND id < {lo + 7}")
            model = [r for r in model if not (lo <= r[0] < lo + 7)]
        elif op == "update":
            g = rng.choice("abcde")
            cat.sql(f"UPDATE {name} SET qty = qty + 1000 WHERE grade = '{g}'")
            model = [
                (i, gr, q + 1000) if gr == g else (i, gr, q)
                for i, gr, q in model
            ]
        elif op == "merge":
            batch = {r[0]: r for r in _mk_rows(rng, rng.randrange(1, 5))}
            rows = list(batch.values())
            cat.sql(
                f"MERGE INTO {name} AS t USING "
                f"(SELECT * FROM (VALUES {_values_sql(rows)}) "
                f"AS v(id, grade, qty)) AS s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            model = [r for r in model if r[0] not in batch] + rows
        elif op == "mode_flip":
            mode = rng.choice(["merge-on-read", "copy-on-write"])
            # SQL UPDATE can't name equality-delete keys, so MOR rides on
            # positional deletes (the same pairing q_meta_pos_delete uses)
            style = "position" if mode == "merge-on-read" else "equality"
            cat.sql(
                f"ALTER TABLE {name} SET TBLPROPERTIES ("
                f"'write.delete.mode' = '{mode}', "
                f"'write.update.mode' = '{mode}', "
                f"'write.merge.mode' = '{mode}', "
                f"'write.delete.style' = '{style}')"
            )
        got = sorted(
            tuple(r) for r in cat.sql(f"SELECT * FROM {name}").collect()
        )
        assert got == sorted(model), f"seed={seed} step={step} after {op}"


@pytest.mark.parametrize(
    "seed",
    # one-seed default-run representative; the rest under -m slow (r16:
    # the driver's verification window could not fit the full suite)
    [SEEDS[0]] + [pytest.param(s, marks=pytest.mark.slow) for s in SEEDS[1:]],
)
def test_sql_facade_dml_fuzz(spark, tmp_path, seed):
    _run_sql_model(spark, tmp_path, seed)
