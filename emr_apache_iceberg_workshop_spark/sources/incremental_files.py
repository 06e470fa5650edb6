"""Incremental file discovery (SURVEY.md §2.1 S2/S3).

Reference parity: `raw-bronze.py:59-85` — list the input tree, keep files
whose mtime is newer than the checkpoint watermark. Local-FS walk (the S3
`list_objects_v2` variant is the same logic against a different listing).

Scale note: mtime-listing is O(files) on the driver; at 100 TB the
Spark-native replacement is a Structured Streaming file source with
`Trigger.AvailableNow` + checkpointLocation (see streaming/jobs.py), which
tracks processed files transactionally instead of by timestamp.
"""

from __future__ import annotations

import os

from .checkpoints import CheckpointStore


class IncrementalFileSource:
    def __init__(self, input_dir: str, checkpoint: CheckpointStore, suffix: str = ".csv"):
        self.input_dir = input_dir
        self.checkpoint = checkpoint
        self.suffix = suffix

    def get_new_files(self) -> tuple[list[str], float]:
        """Files with mtime > checkpoint; returns (paths, max_mtime_seen).

        The caller commits `max_mtime_seen` only after a successful write
        (`raw-bronze.py:249-253` ordering)."""
        last = self.checkpoint.last_processed_time()
        new_files: list[str] = []
        max_seen = last
        for dirpath, _dirs, files in os.walk(self.input_dir):
            for name in files:
                if not name.endswith(self.suffix):
                    continue
                path = os.path.join(dirpath, name)
                mtime = os.path.getmtime(path)
                if mtime > last:
                    new_files.append(path)
                    max_seen = max(max_seen, mtime)
        return sorted(new_files), max_seen
