"""JSON checkpoint store (SURVEY.md §2.1 S4/S8).

Reference parity: `raw-bronze.py:36-53,87-99` (file-mtime watermark) and
`bronze-silver.py:75-109` (snapshot id) — a tiny JSON doc, committed ONLY
after the downstream write succeeds (`raw-bronze.py:249-253`,
`bronze-silver.py:315-317`), so a failed run reprocesses rather than
skips. Local-FS flavor (the reference's S3/boto3 variant is config-only).
"""

from __future__ import annotations

import json
import os
import uuid


class CheckpointStore:
    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def save(self, state: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    # named accessors matching the reference's two checkpoint shapes
    def last_processed_time(self) -> float:
        return float(self.load().get("last_processed_time", 0.0))

    def commit_processed_time(self, ts: float) -> None:
        self.save({"last_processed_time": ts})

    def last_processed_snapshot(self) -> int | None:
        v = self.load().get("last_processed_snapshot")
        return int(v) if v is not None else None

    def commit_processed_snapshot(self, snapshot_id: int) -> None:
        self.save({"last_processed_snapshot": snapshot_id})
