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


FEATURE_DIM = 8
FEATURES_SCHEMA = "doc_id long, modality string, " + ", ".join(
    f"f{i} double" for i in range(FEATURE_DIM)
)


def _fake_features(payload: bytes) -> list[float]:
    """STUB feature extractor: 8 deterministic doubles from the md5 digest
    (a real implementation would run an image/audio embedding model —
    none installed here). md5 keeps it oracle-reproducible in SQL."""
    import hashlib

    dig = hashlib.md5(payload).hexdigest()
    return [int(dig[2 * i : 2 * i + 2], 16) / 255.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: binary payload → fixed-width float
    columns. Arrow-batched; at 100 TB this is the GPU-inference slot (swap
    `_fake_features` for a model call, batch size = Arrow batch)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_fake_features)
            out = {"doc_id": pdf["doc_id"], "modality": pdf["modality"]}
            for i in range(FEATURE_DIM):
                out[f"f{i}"] = feats.map(lambda v, i=i: v[i])
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width long, height long, out_width long, out_height long, scale double"
)


def resize_images(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planner for image rows: computes output geometry JVM-side
    (aspect-preserving fit into max_side × max_side; never upscales).
    The pixel resample itself is the stubbed codec step — payload plumbing
    and geometry are the testable Spark surface."""
    w, h = F.col("width"), F.col("height")
    long_side = F.greatest(w, h)
    scale = F.when(long_side > max_side, F.lit(max_side) / long_side).otherwise(F.lit(1.0))
    return (
        meta.filter(F.col("modality") == "image")
        .select(
            "doc_id",
            "width",
            "height",
            F.floor(w * scale).cast("long").alias("out_width"),
            F.floor(h * scale).cast("long").alias("out_height"),
            scale.alias("scale"),
        )
    )
