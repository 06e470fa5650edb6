"""Round-9 late additions: URL canonicalization dedup, the quality-rule
funnel, and two-pass exact heavy hitters.

The oracle pairs grade end-to-end parity; these tests pin the pieces the
oracle can't isolate: individual canonicalization rules on handcrafted
URLs, first-failed-rule attribution when a document breaks several rules
at once, and the heavy-hitter candidate guarantee on an adversarial
batch split (a token under the local threshold in all but one batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_apache_iceberg_workshop_spark.plans.dedup import (
    _canonical_url_expr,
    _url_expr,
)
from emr_apache_iceberg_workshop_spark.plans.textops import (
    _HH_K,
    heavy_hitter_candidates,
)


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    expr = _canonical_url_expr("spark", "url")
    return [r[0] for r in df.selectExpr(f"{expr} AS c").collect()]


def test_url_canonical_rules(spark):
    got = _canon(
        spark,
        [
            # case folding + default port + fragment
            "HTTPS://Host.Example.COM:443/docs/en/item-3#section-2",
            # trailing slash
            "https://host.example.com/docs/en/item-3/",
            # tracking params dropped entirely (dangling '?' must not stay)
            "https://host.example.com/docs/en/item-3?utm_source=feed&utm_campaign=x",
            # param order normalized, utm_* removed from a mixed string
            "https://host.example.com/docs/en/item-3?b=2&utm_medium=email&a=1",
            "https://host.example.com/docs/en/item-3?a=1&b=2",
        ],
    )
    base = "https://host.example.com/docs/en/item-3"
    assert got == [base, base, base, base + "?a=1&b=2", base + "?a=1&b=2"]


def test_url_canonical_keeps_distinct_pages(spark):
    got = _canon(
        spark,
        [
            "https://host.example.com/docs/en/item-3",
            "https://host.example.com/docs/en/item-4",
            "https://other.example.com/docs/en/item-3",
            "https://host.example.com/docs/en/item-3?a=2",
        ],
    )
    assert len(set(got)) == 4


def test_url_spark_duck_construction_parity(spark, duck):
    """The generated messy URL text itself must be identical in both
    engines (the oracle depends on it)."""
    spark_urls = {
        r[0]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr(f"{_url_expr('spark')} AS u")
        .collect()
    }
    duck_urls = {
        r[0]
        for r in duck.sql(
            f"SELECT {_url_expr('duck')} AS u FROM documents"
        ).fetchall()
    }
    assert spark_urls == duck_urls


def test_quality_funnel_first_fail_attribution(spark):
    from emr_apache_iceberg_workshop_spark.plans.curation import _funnel_verdict

    short_mismatch = "el la de que y"  # 5 tokens AND wrong lang: rule 1 wins
    repeats = " ".join(["the"] * 30)  # low ttr AND short mwl ok: ttr after len
    ok = "the quick brown fox jumps over a lazy dog and the dog is of good cheer " * 2
    df = spark.createDataFrame(
        [(short_mismatch, "en"), (repeats, "en"), (ok, "en")],
        "text string, lang string",
    )
    rows = df.selectExpr(
        f"size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS n_toks_probe",
        "lang",
        "text",
    )
    m = rows.selectExpr(
        "lang",
        "text",
        "size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS n_toks",
        """CASE WHEN size(regexp_extract_all(text, '[a-z0-9]+', 0)) > 0
             THEN CAST(aggregate(regexp_extract_all(text, '[a-z0-9]+', 0), 0L,
                                 (acc, x) -> acc + length(x)) AS DOUBLE)
                  / size(regexp_extract_all(text, '[a-z0-9]+', 0)) ELSE 0.0 END AS mwl""",
        """CASE WHEN size(regexp_extract_all(text, '[a-z0-9]+', 0)) > 0
             THEN CAST(size(array_distinct(regexp_extract_all(text, '[a-z0-9]+', 0))) AS DOUBLE)
                  / size(regexp_extract_all(text, '[a-z0-9]+', 0)) ELSE 0.0 END AS ttr""",
    )
    from emr_apache_iceberg_workshop_spark.plans.textops import _predicted

    verdicts = [
        r[0]
        for r in m.selectExpr(f"{_predicted('spark')} AS pred", "*")
        .selectExpr(f"{_funnel_verdict('spark')} AS verdict")
        .collect()
    ]
    assert verdicts == ["1_too_short", "4_low_ttr", "pass"]


def test_heavy_hitter_candidate_guarantee(spark):
    """Adversarial split: 'rare' sits below the per-batch threshold in
    every batch EXCEPT one, and its merged emitted sum must still clear
    the global N/capacity bar (the 2N/capacity exactness bound in
    action). With capacity=4 and three 8-token batches, N=24: 'rare' has
    global count 13 > 2N/4 = 12, emits 11 from batch one (11 > 8/4) and
    nothing from the others (1 <= 2 each) — merged sum 11 > 24/4 = 6."""
    batches = [
        ["rare"] * 11 + ["x1"],
        ["a", "b", "rare", "c", "x2", "x2"],
        ["d", "e", "rare", "f", "x3", "x3"],
    ]
    df = spark.createDataFrame(
        [(" ".join(b),) for b in batches], "text string"
    ).repartition(3)
    emitted = heavy_hitter_candidates(df, capacity=4).collect()
    merged = {}
    for r in emitted:
        merged[r["token"]] = merged.get(r["token"], 0) + r["cnt"]
    n_total = sum(len(b) for b in batches)
    survivors = {t for t, s in merged.items() if s > n_total / 4}
    assert "rare" in survivors
    # the bound on the other side: at most capacity survivors, ever
    assert len(survivors) <= 4


def test_heavy_hitters_matches_exact_topk(spark):
    """End-to-end equality with the naive one-pass top-k on real fixture
    data (the same check the oracle runs, but in-process and at the
    smoke scale, with deterministic tiebreak)."""
    from emr_apache_iceberg_workshop_spark.plans.textops import (
        TOKS_S,
        t_heavy_hitters,
    )

    sf = "/root/testdata/sf0.001"
    got = t_heavy_hitters(spark, sf).collect()
    exact = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .selectExpr(f"explode({TOKS_S}) AS token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(_HH_K)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]


def test_exif_parse_rejects_and_survives():
    """Rejection paths return None (never garbage): non-JPEG bytes, a
    JPEG with no Exif APP1, a wrong TIFF magic, and truncation anywhere
    inside the IFD walk must not raise."""
    from emr_apache_iceberg_workshop_spark.operators.multimodal import _exif_parse
    from emr_apache_iceberg_workshop_spark.plans.multimodal import _exif_payloads

    good = _exif_payloads()[0][1]
    assert _exif_parse(b"not a jpeg") is None
    assert _exif_parse(b"\xff\xd8\xff\xdb\x00\x04\x00\x00\xff\xd9") is None
    bad_magic = bytearray(good)
    bad_magic[good.index(b"II")+2] = 99  # TIFF magic 42 -> 99
    assert _exif_parse(bytes(bad_magic)) is None
    for cut in range(10, len(good), 7):
        _exif_parse(good[:cut])  # any prefix: parse or None, never raise


def test_exif_both_byte_orders_and_inline_rule():
    """Odd docs are II with an offset-stored Make; even docs are MM with
    the inline (<=4 bytes) Make — both must decode to the constructed
    values, and the skip-tags (MakerNote, private 0x9999) never leak."""
    from emr_apache_iceberg_workshop_spark.operators.multimodal import _exif_parse
    from emr_apache_iceberg_workshop_spark.plans.multimodal import _exif_payloads

    for d, payload in _exif_payloads():
        got = _exif_parse(payload)
        assert got["byte_order"] == ("II" if d % 2 == 1 else "MM")
        assert got["make"] == (f"cam{d % 5}" if d % 2 == 1 else f"c{d % 5}")
        assert got["orientation"] == d % 8 + 1
        assert got["xres_num"] == 72 * (d % 4 + 1) and got["xres_den"] == 1
        assert got["iso"] == 100 * (d % 8 + 1)
        assert got["exp_den"] == 60 + 7 * d
        assert got["pix_x"] == 640 + 16 * d and got["pix_y"] == 480 + 9 * d
        assert 0x927C not in got and 0x9999 not in got


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a much longer one: containment ~1.0
    while jaccard is far below its 0.3 gate — the asymmetric tier's
    reason to exist. Orientation: the smaller set is the contained one."""
    from emr_apache_iceberg_workshop_spark.plans.dedup import (
        SHINGLES_S,
        _containment_scored_pairs,
        _jaccard_scored_pairs,
    )

    words = [f"w{i}" for i in range(40)]
    short = " ".join(words)
    long = " ".join(words + [f"pad{i}" for i in range(400)])
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    ).selectExpr("doc_id", f"{SHINGLES_S} AS sh")
    got = _containment_scored_pairs(docs).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["contained_id"], r["container_id"]) == (1, 2)
    assert r["containment"] == 1.0
    # the symmetric tier rejects the same pair (containment's reason to exist)
    assert _jaccard_scored_pairs(docs, materialized=True).count() == 0


def test_position_deletes_table_lifecycle(spark, tmp_path):
    """.position_deletes: empty with no deletes, one row per (file, pos)
    identity while MOR deletes are active, empty again after compact()
    folds them into data files."""
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    ddl = "id bigint, v string"
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), ddl,
        properties={"write.delete.mode": "merge-on-read",
                    "write.delete.style": "position"},
    )
    t.write(spark.createDataFrame([(i, "x") for i in range(6)], ddl)
            .coalesce(1).sortWithinPartitions("id"))
    assert t.position_deletes_table().count() == 0
    t.delete_where("id >= 4")
    rows = t.position_deletes_table().collect()
    assert sorted(r["pos"] for r in rows) == [4, 5]
    assert {r["delete_snapshot_id"] for r in rows} == {2}
    t.compact()
    assert t.position_deletes_table().count() == 0
    assert sorted(r["id"] for r in t.scan().collect()) == [0, 1, 2, 3]


def test_epoch_shuffle_permutation_properties(spark):
    """Each epoch is a reproducible permutation, and different epochs
    order the corpus differently (the reshuffle contract)."""
    from emr_apache_iceberg_workshop_spark.plans.curation import c_epoch_shuffle

    sf = "/root/testdata/sf0.001"
    a = c_epoch_shuffle(spark, sf).collect()
    b = c_epoch_shuffle(spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_epoch = {}
    for r in a:
        by_epoch.setdefault(r["epoch"], []).append((r["rank"], r["doc_id"]))
    orders = [tuple(d for _, d in sorted(v)) for v in by_epoch.values()]
    assert len(orders) == 3
    assert len(set(orders)) == 3  # every epoch a different order
    for v in by_epoch.values():  # each a prefix of a permutation: no dups
        docs = [d for _, d in v]
        assert len(set(docs)) == len(docs)
