"""Properties of the round-8 operators beyond what the value-hash oracle
checks: simhash64 precision vs the 32-bit fingerprint, bigram-LM score
bounds, and temperature-mix flattening."""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE


def test_simhash64_tighter_than_32bit(spark):
    """Doubling the fingerprint width shrinks the hamming-<=3 ball relative
    to the space, so the 64-bit near-dup set must be a (strict, on this
    dup-dense fixture) subset-in-size of the 32-bit one, and exact
    duplicates (identical distinct-token sets) must still collide at
    hamming 0."""
    from emr_apache_iceberg_workshop_spark.catalog import load_table
    from emr_apache_iceberg_workshop_spark.plans.dedup import d_simhash, d_simhash64
    from emr_apache_iceberg_workshop_spark.plans.textops import TOKS_S

    n32 = d_simhash(spark, SF_SMOKE).count()
    p64 = d_simhash64(spark, SF_SMOKE).collect()
    assert 0 < len(p64) < n32
    for r in p64:
        assert 0 <= r.hamming <= 3
        assert r.doc_a < r.doc_b
    # the fingerprint is a pure function of the distinct-token SET, so any
    # two docs with identical token sets must appear at hamming 0
    zero_pairs = {(r.doc_a, r.doc_b) for r in p64 if r.hamming == 0}
    sets = (
        load_table(spark, SF_SMOKE, "documents")
        .selectExpr(
            "doc_id",
            f"md5(concat_ws(' ', array_sort(array_distinct({TOKS_S})))) AS h",
        )
        .collect()
    )
    by_hash: dict = {}
    for r in sets:
        by_hash.setdefault(r.h, []).append(r.doc_id)
    groups = [sorted(ids) for ids in by_hash.values() if len(ids) > 1]
    assert groups, "fixture has no identical-token-set docs"
    for ids in groups[:20]:
        assert (ids[0], ids[1]) in zero_pairs


def test_simhash64_rerun_deterministic(spark):
    from emr_apache_iceberg_workshop_spark.plans.dedup import _simhash64_cache, d_simhash64

    a = sorted(map(tuple, d_simhash64(spark, SF_SMOKE).collect()))
    _simhash64_cache.clear()  # force signature recompute, not cache replay
    b = sorted(map(tuple, d_simhash64(spark, SF_SMOKE).collect()))
    assert a == b


def test_bigram_logprob_bounds(spark):
    """Add-one smoothing bounds every per-bigram nlp in (0, ln(c_max + V)),
    so the per-doc mean must lie inside those bounds; docs with < 2 tokens
    have no bigrams and are excluded."""
    from emr_apache_iceberg_workshop_spark.catalog import load_table
    from emr_apache_iceberg_workshop_spark.plans.textops import TOKS_S, t_bigram_logprob

    docs = load_table(spark, SF_SMOKE, "documents")
    n_tokens_total = docs.selectExpr(f"sum(size({TOKS_S})) AS n").collect()[0].n
    n_multi = docs.selectExpr(f"size({TOKS_S}) AS n").filter("n >= 2").count()
    rows = t_bigram_logprob(spark, SF_SMOKE).collect()
    assert len(rows) == n_multi
    ub = math.log(n_tokens_total + n_tokens_total)  # c_u + V <= N + V <= 2N
    for r in rows:
        assert 0.0 < r.mean_nlp < ub
        assert r.n_bigrams >= 1
        assert r.passes_lm_gate == (r.mean_nlp <= 3.4)


def test_temperature_mix_flattens(spark):
    """alpha = 0.5 temperature weights must (a) sum to ~1, (b) be strictly
    flatter than the raw shares (smaller max/min spread), (c) upweight the
    lowest-resource stratum's sampling rate above the highest-resource
    one's, with every realized sample within its stratum."""
    from emr_apache_iceberg_workshop_spark.plans.curation import c_temperature_mix

    rows = {r.lang: r for r in c_temperature_mix(spark, SF_SMOKE).collect()}
    assert len(rows) >= 2
    assert abs(sum(r.temp_weight for r in rows.values()) - 1.0) < 1e-6
    assert abs(sum(r.raw_share for r in rows.values()) - 1.0) < 1e-6
    raw = [r.raw_share for r in rows.values()]
    tw = [r.temp_weight for r in rows.values()]
    assert max(tw) / min(tw) < max(raw) / min(raw)
    lo = min(rows.values(), key=lambda r: r.n_docs)
    hi = max(rows.values(), key=lambda r: r.n_docs)
    assert lo.sample_rate > hi.sample_rate
    assert lo.effective_epochs > hi.effective_epochs
    for r in rows.values():
        assert 0 <= r.n_sampled <= r.n_docs
        assert r.sample_rate <= 1.0


def test_bm25_topk_matches_pure_python(spark):
    """Independent re-derivation: recompute Okapi BM25 in plain Python
    (re.findall tokenizer, collections.Counter) from the raw parquet and
    assert the engine's top-10 is the same ranked set with scores equal
    to 1e-9 (the query's own rounding grain)."""
    import re as _re
    from collections import Counter

    import duckdb

    from emr_apache_iceberg_workshop_spark.plans.textops import (
        _BM25_K,
        _BM25_TERMS,
        t_bm25_topk,
    )

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    toks = {d: _re.findall(r"[a-z0-9]+", t or "") for d, t in rows}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = Counter()
    for tk in _BM25_TERMS:
        df[tk] = sum(1 for v in toks.values() if tk in v)
    scores = {}
    for d, v in toks.items():
        tf = Counter(t for t in v if t in _BM25_TERMS)
        s = 0.0
        for tk, f in tf.items():
            idf = math.log(1.0 + (n_docs - df[tk] + 0.5) / (df[tk] + 0.5))
            s += idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
        if tf:
            scores[d] = (len(tf), s)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:_BM25_K]

    got = t_bm25_topk(spark, SF_SMOKE).collect()
    assert len(got) == _BM25_K
    assert [r.doc_id for r in got] == [d for d, _ in expect]
    for r, (d, (hit, s)) in zip(got, expect):
        assert r.n_terms_hit == hit
        assert abs(r.bm25 - s) < 1e-9


def test_ccnet_buckets_terciles(spark):
    """Bucket sizes are within one histogram-cell of n/3 each way, every
    doc of a given score lands in one bucket, and cutoffs are the exact
    ceil(n/3)/ceil(2n/3) order statistics of the rounded scores."""
    from emr_apache_iceberg_workshop_spark.plans.textops import t_ccnet_buckets

    rows = t_ccnet_buckets(spark, SF_SMOKE).collect()
    assert rows
    by_score = {}
    for r in rows:
        assert r.bucket in ("head", "middle", "tail")
        by_score.setdefault(r.mean_nlp, set()).add(r.bucket)
    assert all(len(v) == 1 for v in by_score.values()), "bucket not score-pure"
    n = len(rows)
    scores = sorted(r.mean_nlp for r in rows)
    c1, c2 = scores[-(-n // 3) - 1], scores[-(-2 * n // 3) - 1]
    for r in rows:
        expect = "head" if r.mean_nlp <= c1 else "middle" if r.mean_nlp <= c2 else "tail"
        assert r.bucket == expect, (r.doc_id, r.mean_nlp, r.bucket, expect)
    n_head = sum(1 for r in rows if r.bucket == "head")
    assert n_head >= -(-n // 3) - sum(1 for s in scores if s == c1) + 1


def test_rp_quality_error_bounded(spark):
    """The JL bound: a 16-dim ±1 projection of 64-dim vectors should keep
    cosine error well under 0.5 on average (ε ~ sqrt(ln n / k)); and the
    projection must be deterministic across plan rebuilds."""
    from emr_apache_iceberg_workshop_spark.plans.similarity import s_rp_quality

    rows = s_rp_quality(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_pairs > 0
        assert 0.0 <= r.mean_abs_err < 0.5, r
        assert r.mean_abs_err <= r.max_abs_err <= 2.0
    again = s_rp_quality(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_entropy_matches_pure_python(spark):
    """Independent re-derivation of per-doc token entropy in plain Python;
    also pins the analytic bounds 0 <= H <= ln(n_tokens)."""
    import re as _re
    from collections import Counter

    import duckdb

    from emr_apache_iceberg_workshop_spark.plans.textops import t_entropy

    rows = {r.doc_id: r for r in t_entropy(spark, SF_SMOKE).collect()}
    raw = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    n_checked = 0
    for doc_id, text in raw:
        toks = _re.findall(r"[a-z0-9]+", text or "")
        if not toks:
            assert doc_id not in rows
            continue
        c = Counter(toks)
        n = len(toks)
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        r = rows[doc_id]
        assert r.n_tokens == n and r.n_distinct == len(c)
        assert abs(r.entropy - h) < 1e-8, (doc_id, r.entropy, h)
        assert -1e-9 <= r.entropy <= math.log(n) + 1e-9
        n_checked += 1
    assert n_checked == len(rows)


def test_wav_pcm_chunk_walk():
    """The WAV decode is a real chunk walk: LIST chunks between fmt and
    data are stepped over, odd-length chunks are word-aligned, and
    non-PCM16 / truncated / non-WAV payloads are refused (None)."""
    import struct

    import numpy as np

    from emr_apache_iceberg_workshop_spark.operators.multimodal import _wav_pcm

    samples = np.array([0, 100, -100, 32767, -32768, 1], dtype="<i2")
    data = samples.tobytes()

    def wav(chunks):
        body = b"WAVE" + b"".join(
            cid + struct.pack("<I", len(c)) + c + (b"\x00" if len(c) % 2 else b"")
            for cid, c in chunks
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16)[4:]
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    # fmt, an odd-length LIST (forces alignment padding), then data
    w = wav([(b"fmt ", fmt), (b"LIST", b"INFO\x00"), (b"data", data)])
    rate, got = _wav_pcm(w)
    assert rate == 44100
    assert np.array_equal(got, samples)
    # stereo refused; 8-bit refused; non-wav refused
    stereo = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    assert _wav_pcm(wav([(b"fmt ", stereo), (b"data", data)])) is None
    eight = struct.pack("<HHIIHH", 1, 1, 44100, 44100, 1, 8)
    assert _wav_pcm(wav([(b"fmt ", eight), (b"data", data)])) is None
    assert _wav_pcm(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert _wav_pcm(b"plain text") is None


def test_pcm_features_matches_pure_python(spark):
    """Independent struct-level re-derivation of every m_pcm_features
    column from the raw fixture bytes (no numpy on the checking side)."""
    import struct

    from emr_apache_iceberg_workshop_spark.plans.multimodal import (
        _pcm_payloads,
        m_pcm_features,
    )

    got = {r.doc_id: r for r in m_pcm_features(spark, SF_SMOKE).collect()}
    assert len(got) == 8
    for d, payload in _pcm_payloads():
        # locate the data chunk by a straight scan of the checked bytes
        i = 12
        rate = None
        vals = None
        while i + 8 <= len(payload):
            cid = payload[i:i + 4]
            (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
            if cid == b"fmt ":
                rate = struct.unpack("<I", payload[i + 12:i + 16])[0]
            if cid == b"data":
                vals = list(struct.unpack(f"<{clen // 2}h", payload[i + 8:i + 8 + clen]))
            i += 8 + clen + (clen & 1)
        r = got[d]
        assert r.sample_rate == rate == 8000 + 100 * d
        assert r.n_samples == len(vals) == 240 + 16 * d
        assert r.peak_abs == max(abs(v) for v in vals)
        assert r.zero_crossings == sum(
            1 for a, b in zip(vals, vals[1:]) if (a < 0) != (b < 0)
        )
        assert r.sum_sq == sum(v * v for v in vals)
        assert abs(r.rms - math.sqrt(r.sum_sq / r.n_samples)) < 1e-8


def test_bmp_decode_real_details():
    """The BMP decode handles the three format details a fake would skip:
    bottom-up row order (vs a top-down negative-height twin), 4-byte row
    padding, and BGR byte order; non-24-bit and compressed BMPs refuse."""
    import struct

    import numpy as np

    from emr_apache_iceberg_workshop_spark.operators.multimodal import _bmp_pixels

    w, h = 3, 2  # stride 12 -> 3 padding bytes per row
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)

    def bmp(height_field, rows):
        data = rows.tobytes()
        return (
            b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, 24, 0,
                          len(data), 0, 0, 0, 0)
            + data
        )

    stride = (3 * w + 3) // 4 * 4
    rows_bu = np.zeros((h, stride), dtype=np.uint8)
    rows_bu[:, : 3 * w] = rgb[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
    got_w, got_h, got = _bmp_pixels(bmp(h, rows_bu))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, rgb)
    # top-down variant (negative height) must NOT be flipped
    rows_td = np.zeros((h, stride), dtype=np.uint8)
    rows_td[:, : 3 * w] = rgb[:, :, ::-1].reshape(h, 3 * w)
    _, _, got_td = _bmp_pixels(bmp(-h, rows_td))
    assert np.array_equal(got_td, rgb)
    # refusals: 8-bit, compressed, truncated pixel array, not a BMP
    bad_bpp = bytearray(bmp(h, rows_bu)); bad_bpp[28] = 8
    assert _bmp_pixels(bytes(bad_bpp)) is None
    bad_comp = bytearray(bmp(h, rows_bu)); bad_comp[30] = 1
    assert _bmp_pixels(bytes(bad_comp)) is None
    assert _bmp_pixels(bmp(h, rows_bu)[:-5]) is None
    assert _bmp_pixels(b"not a bitmap") is None
