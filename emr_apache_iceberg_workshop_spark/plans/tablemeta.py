"""Snapshot-table metadata queries (Iceberg `.history` / `.snapshots` /
`.files` analogues — reference `bronze-silver.py:116-138` queries
`.history`; `.snapshots` and `.files` are the next metadata tables an
Iceberg user reaches for).

Queries are registered in task order; populated alongside
`tables.SnapshotTable.snapshots_table()` / `.files_table()`.
"""

from __future__ import annotations
