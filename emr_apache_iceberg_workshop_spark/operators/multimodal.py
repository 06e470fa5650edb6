"""Multimodal column operators: opaque `binary` payloads + typed metadata.

The container has no image/audio/video codecs, so the *decode* step is a
deterministic fake (documented stub) — but the Spark-side plumbing is
real and tested: binary columns through Arrow batches, `mapInPandas`
schema contracts, row-expanding frame sampling.

At 100 TB the payloads dominate: `decode_metadata` streams Arrow batches
(no row-at-a-time pickling); frame sampling expands rows JVM-side via
`explode(sequence(...))` — the UDF never materializes frames it doesn't
emit.

Swap `_fake_decode` with a real codec (PIL/ffmpeg) by replacing one
function; the operator contract (schema in/out) does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "doc_id long, modality string, byte_len long, width long, height long, n_frames long"
)


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder: deterministic metadata derived from the byte stream.

    A real implementation would dispatch on magic bytes to PIL / soundfile /
    pyav; none are installed here (NotImplementedError for real codecs is
    the documented behavior — this fake keeps the pipeline testable).
    """
    n = len(payload)
    return {"byte_len": n, "width": n % 640, "height": (n * 7) % 480, "n_frames": n % 30 + 1}


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: binary payload + modality tag."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "modality",
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")),
    )


def decode_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas over Arrow batches: binary payload → typed metadata."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": meta.map(lambda m: m["byte_len"]),
                    "width": meta.map(lambda m: m["width"]),
                    "height": meta.map(lambda m: m["height"]),
                    "n_frames": meta.map(lambda m: m["n_frames"]),
                }
            )

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


def sample_frames(meta: DataFrame, every: int = 10) -> DataFrame:
    """Row-expanding frame sampler for video rows (JVM-side explode)."""
    return (
        meta.filter(F.col("modality") == "video")
        .select(
            "doc_id",
            "n_frames",
            F.explode(F.expr(f"sequence(0L, n_frames - 1, CAST({every} AS BIGINT))")).alias("frame_idx"),
        )
    )
