"""Round-9 operators: real PNG and GIF pixel decodes (stdlib-only) and
the simhash cluster-representative output.

The oracle queries (m_png_pixels / m_gif_pixels / d_simhash_clusters)
pin end-to-end arithmetic; these tests pin the DECODER internals the
oracle can't isolate: individual PNG filter types, LZW dictionary
growth/clear/just-out-of-dict handling, and rejection of out-of-scope
flavors (no silent garbage)."""

from __future__ import annotations

import numpy as np
import pytest

from emr_apache_iceberg_workshop_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_pixels,
    _png_pixels,
)
from emr_apache_iceberg_workshop_spark.plans.multimodal import (
    _gif_encode,
    _gif_lzw_encode,
    _png_encode,
)


def _px(d, w, h, ch):
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(ch, dtype=np.int64)[None, None, :]
    return ((d * 131 + x * 7 + y * 17 + c * 37) % 256).astype(np.uint8)


@pytest.mark.parametrize("ch", [3, 4])
def test_png_roundtrip_all_filters(ch):
    # h = 10 -> every filter type (y % 5) appears twice
    pix = _px(3, 7, 10, ch)
    w, h, got_ch, got = _png_pixels(_png_encode(7, 10, ch, pix))
    assert (w, h, got_ch) == (7, 10, ch)
    assert (got == pix).all()


def test_png_single_filter_rows():
    """Each filter type decoded in isolation (a monkey-patched encoder
    forcing one filter for every scanline), so a broken filter cannot
    hide behind correct neighbors."""
    import zlib

    pix = _px(5, 6, 4, 3)
    for forced in range(5):
        # re-filter manually: reuse the encoder then rewrite each
        # scanline with the forced type
        payload = _png_encode(6, 4, 3, pix)
        # decode the IDAT, re-filter, re-encode
        import struct

        i = 8
        chunks = []
        while i < len(payload):
            (ln,) = struct.unpack(">I", payload[i : i + 4])
            ctype = payload[i + 4 : i + 8]
            chunks.append((ctype, payload[i + 8 : i + 8 + ln]))
            i += 12 + ln
        raw = bytearray(zlib.decompress(b"".join(b for t, b in chunks if t == b"IDAT")))
        stride = 6 * 3
        flat = pix.reshape(4, stride).astype(np.int64)

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        out = bytearray()
        for y in range(4):
            out.append(forced)
            prior = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
            for k in range(stride):
                left = int(flat[y][k - 3]) if k >= 3 else 0
                up = int(prior[k])
                ul = int(prior[k - 3]) if k >= 3 else 0
                v = int(flat[y][k])
                f = [v, v - left, v - up, v - (left + up) // 2,
                     v - paeth(left, up, ul)][forced]
                out.append(f % 256)
        body = zlib.compress(bytes(out))

        def chunk(ctype, b):
            crc = zlib.crc32(ctype + b) & 0xFFFFFFFF
            return struct.pack(">I", len(b)) + ctype + b + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", body) + chunk(b"IEND", b""))
        dec = _png_pixels(png)
        assert dec is not None, forced
        assert (dec[3] == pix).all(), f"filter {forced}"


def test_png_rejects_out_of_scope():
    pix = _px(1, 4, 4, 3)
    good = _png_encode(4, 4, 3, pix)
    assert _png_pixels(b"nonsense") is None
    # 16-bit depth flag
    bad = bytearray(good)
    bad[8 + 8 + 8] = 16  # IHDR bit-depth byte
    assert _png_pixels(bytes(bad)) is None
    # truncated IDAT (zlib error)
    assert _png_pixels(good[:40]) is None


def test_gif_lzw_dict_growth_and_clear():
    # long pseudo-random sequence: code width must grow past mcs+1
    idx = [(i * 37 + (i * i) % 13) % 64 for i in range(3000)]
    enc = _gif_lzw_encode(6, idx)
    assert _gif_lzw_decode(6, enc, len(idx)) == idx
    # forced periodic clears round-trip too
    enc2 = _gif_lzw_encode(6, idx, force_clear_every=50)
    assert _gif_lzw_decode(6, enc2, len(idx)) == idx
    # constant run: the code==len(table) just-out-of-dict case fires
    run = [9] * 500
    assert _gif_lzw_decode(6, _gif_lzw_encode(6, run), 500) == run


def test_gif_first_frame_and_count():
    idx = [(x + y) % 64 for y in range(5) for x in range(8)]
    payload = _gif_encode(1, 8, 5, idx)
    w, h, frames, rgb = _gif_pixels(payload)
    assert (w, h, frames) == (8, 5, 2)  # first frame decoded, 2 counted
    exp = np.array(
        [[((i * 41 + 7) % 256, (i * 73 + 11) % 256, (i * 97 + 13) % 256)
          for i in [(x + y) % 64]][0]
         for y in range(5) for x in range(8)],
        dtype=np.uint8,
    ).reshape(5, 8, 3)
    assert (rgb == exp).all()


def test_gif_rejects_out_of_scope():
    assert _gif_pixels(b"GIF89a") is None
    assert _gif_pixels(b"not a gif at all") is None
    idx = [0, 1, 2, 3]
    payload = bytearray(_gif_encode(1, 2, 2, idx))
    payload[-1] = 0x00  # corrupt the trailer -> frame walk still works
    # interlace flag on the first descriptor -> rejected
    # (descriptor packed byte sits right after the 13-byte header + GCT)
    pos = 13 + 64 * 3 + 9
    payload2 = bytearray(_gif_encode(1, 2, 2, idx))
    payload2[pos] |= 0x40
    assert _gif_pixels(bytes(payload2)) is None


def test_simhash_clusters_match_pairs(spark):
    """Cluster sizes must account for exactly the docs that appear in the
    pair output: Σ k(k-1)/2 over components ≥ pair count (banding loses
    no true pair), and every clustered doc has ≥ 1 pair."""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        d_simhash,
        d_simhash_clusters,
    )

    sf = "/root/testdata/sf0.001"
    pairs = d_simhash(spark, sf).select("doc_a", "doc_b").collect()
    clusters = d_simhash_clusters(spark, sf).collect()
    docs_in_pairs = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert sum(r.n_members for r in clusters) == len(docs_in_pairs)
    assert all(r.rep in docs_in_pairs for r in clusters)
    # pairs within a component only: component count via union-find
    parent = {d: d for d in docs_in_pairs}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for r in pairs:
        ra, rb = find(r.doc_a), find(r.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for d in docs_in_pairs:
        comps.setdefault(find(d), []).append(d)
    exp = sorted((min(v), len(v), sum(v)) for v in comps.values())
    assert sorted((r.rep, r.n_members, r.sum_doc_ids) for r in clusters) == exp


def test_jpeg_entropy_decode_details():
    """Decoder internals the oracle can't isolate: DC prediction chains
    across blocks, ZRL runs, byte unstuffing, and rejection of
    out-of-scope JPEG flavors."""
    from emr_apache_iceberg_workshop_spark.operators.multimodal import (
        _jpeg_coeffs,
        _jpeg_pixels,
    )
    from emr_apache_iceberg_workshop_spark.plans.multimodal import (
        _JPEG_QT,
        _jpeg_doc_shape,
        _jpeg_payloads,
        _jpeg_positions,
        _jpeg_qval,
    )

    stuffed = 0
    for d, p in _jpeg_payloads():
        w, h, blocks = _jpeg_coeffs(p)
        wb, hb = _jpeg_doc_shape(d)
        assert (w, h, len(blocks)) == (8 * wb, 8 * hb, wb * hb)
        for b, coef in enumerate(blocks):
            exp = {k: _jpeg_qval(d, b, k) * _JPEG_QT[k] for k in _jpeg_positions(d)}
            assert all(coef[k] == exp.get(k, 0) for k in range(64)), (d, b)
        if b"\xff\x00" in p[p.find(b"\xff\xda") :]:
            stuffed += 1
        px = _jpeg_pixels(p)
        assert px is not None and px[2].shape == (h, w)
    assert stuffed >= 1, "fixture set must exercise byte unstuffing"
    # even docs use support {0, 20, 63}: gaps of 19 and 42 force ZRL
    # symbols, and a nonzero at 63 ends the block with no EOB
    assert any(d % 2 == 0 for d, _p in _jpeg_payloads())
    good = dict(_jpeg_payloads())[1]
    assert _jpeg_coeffs(b"\xff\xd8junk") is None
    assert _jpeg_coeffs(b"not jpeg") is None
    # progressive SOF2 flagged out of scope, not mis-decoded
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    assert _jpeg_coeffs(bytes(prog)) is None
    # truncated entropy segment -> clean None, not garbage
    assert _jpeg_coeffs(good[:-20]) is None


def test_jpeg_pixel_sum_independent_idct():
    """The decoder's matrix IDCT agrees with the naive scalar IDCT
    (different summation order) on every fixture — the build-time
    verification backing the inlined pixel_sum oracle literals."""
    import numpy as np

    from emr_apache_iceberg_workshop_spark.operators.multimodal import _jpeg_pixels
    from emr_apache_iceberg_workshop_spark.plans.multimodal import (
        _jpeg_expected_pixel_sums,
        _jpeg_payloads,
    )

    sums = _jpeg_expected_pixel_sums()
    for d, p in _jpeg_payloads():
        _w, _h, px = _jpeg_pixels(p)
        assert int(px.astype(np.int64).sum()) == sums[d]
