"""Incremental file discovery (SURVEY.md §2.1 S2/S3).

Reference parity: `raw-bronze.py:59-85` — list the input tree, keep files
whose mtime is newer than the checkpoint watermark. The listing backend is
a seam (`ObjectLister`): `LocalFSLister` walks the local FS
(`raw-bronze.py:69-77`), `S3Lister` reproduces the reference's paginated
`list_objects_v2` contract (`raw-bronze.py:59-67`: paginate bucket/prefix,
compare `LastModified.timestamp()` to the watermark) against an injected
client — boto3 in production, a fake in tests (no AWS in this sandbox).

Scale note: mtime-listing is O(files) on the driver; at 100 TB the
Spark-native replacement is a Structured Streaming file source with
`Trigger.AvailableNow` + checkpointLocation (see streaming/jobs.py), which
tracks processed files transactionally instead of by timestamp.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Protocol

from .checkpoints import CheckpointStore


class ObjectLister(Protocol):
    def list(self) -> Iterator[tuple[str, float]]:
        """Yield (path, mtime_epoch_seconds) for every candidate object."""
        ...


class LocalFSLister:
    """`os.walk` + `getmtime` listing (`raw-bronze.py:69-77`)."""

    def __init__(self, input_dir: str):
        self.input_dir = input_dir

    def list(self) -> Iterator[tuple[str, float]]:
        for dirpath, _dirs, files in os.walk(self.input_dir):
            for name in files:
                path = os.path.join(dirpath, name)
                yield path, os.path.getmtime(path)


class S3Lister:
    """Paginated `list_objects_v2` listing (`raw-bronze.py:59-67`).

    `client` is anything with `get_paginator("list_objects_v2")` returning
    pages of `{"Contents": [{"Key", "LastModified"}]}` — the boto3 client
    shape. Injected so the pagination/watermark logic is testable without
    AWS; production passes `boto3.client("s3")`.
    """

    def __init__(self, bucket: str, prefix: str = "", client=None):
        if client is None:  # pragma: no cover - no AWS in this sandbox
            import boto3

            client = boto3.client("s3")
        self.bucket = bucket
        self.prefix = prefix
        self.client = client

    def list(self) -> Iterator[tuple[str, float]]:
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket, Prefix=self.prefix):
            for obj in page.get("Contents", []):
                yield (
                    f"s3://{self.bucket}/{obj['Key']}",
                    obj["LastModified"].timestamp(),
                )


class IncrementalFileSource:
    def __init__(
        self,
        input_dir: str | None,
        checkpoint: CheckpointStore,
        suffix: str = ".csv",
        lister: ObjectLister | None = None,
    ):
        if lister is None:
            if input_dir is None:
                raise ValueError("either input_dir or lister is required")
            lister = LocalFSLister(input_dir)
        self.lister = lister
        self.checkpoint = checkpoint
        self.suffix = suffix

    def get_new_files(self) -> tuple[list[str], float]:
        """Files with mtime > checkpoint; returns (paths, max_mtime_seen).

        The caller commits `max_mtime_seen` only after a successful write
        (`raw-bronze.py:249-253` ordering)."""
        last = self.checkpoint.last_processed_time()
        new_files: list[str] = []
        max_seen = last
        for path, mtime in self.lister.list():
            if not path.endswith(self.suffix):
                continue
            if mtime > last:
                new_files.append(path)
                max_seen = max(max_seen, mtime)
        return sorted(new_files), max_seen
