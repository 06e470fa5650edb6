"""Unit tests for composable operators not covered by the oracle harness."""

import pytest
from pyspark.sql import functions as F

from emr_apache_iceberg_workshop_spark.operators import merge_upsert, salted_join
from emr_apache_iceberg_workshop_spark.operators.multimodal import (
    FEATURE_DIM, _fake_features, extract_features, attach_payload,
)


@pytest.fixture(scope="module")
def skew_data(spark):
    # hot key: 9000 of 10000 rows share user_id=1
    rows = [(1 if i % 10 else i, float(i)) for i in range(10_000)]
    big = spark.createDataFrame(rows, "user_id long, v double")
    dim = spark.createDataFrame([(i, f"u{i}") for i in range(10_000)], "user_id long, name string")
    return big, dim


def test_salted_join_matches_plain_join(skew_data):
    big, dim = skew_data
    plain = big.join(dim, "user_id").select("user_id", "v", "name")
    salted = salted_join(big, dim, ["user_id"], salt=8).select("user_id", "v", "name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(skew_data):
    big, dim = skew_data
    missing = dim.filter(F.col("user_id") < 5000)
    plain = big.join(missing, "user_id", "left").select("user_id", "v", "name")
    salted = salted_join(big, missing, ["user_id"], how="left", salt=4).select(
        "user_id", "v", "name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_rejects_other_side_outer(skew_data):
    big, dim = skew_data
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="not skewed-side-preserving"):
            salted_join(big, dim, ["user_id"], how=how)


def test_merge_upsert_null_update_overwrites(spark):
    """A matched source row carrying NULL in a nullable column must
    overwrite the target value (Iceberg WHEN MATCHED THEN UPDATE SET
    t.c = s.c semantics), not keep the stale one."""
    target = spark.createDataFrame(
        [(1, "old-cat", 10.0), (2, "keep-cat", 20.0)], "id long, category string, price double"
    )
    source = spark.createDataFrame(
        [(1, None, 11.0), (3, "new-cat", 30.0)], "id long, category string, price double"
    )
    out = {r.id: r for r in merge_upsert(target, source, ["id"]).collect()}
    assert out[1].category is None and out[1].price == 11.0  # NULL overwrites
    assert out[2].category == "keep-cat"  # unmatched target untouched
    assert out[3].category == "new-cat"  # insert


def test_evolve_schema_add_then_drop_same_call(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), "id bigint, a string")
    t.evolve_schema(add={"b": "string"}, drop=["b"])  # add visible to drop
    assert [f.name for f in t.schema().fields] == ["id", "a"]
    with pytest.raises(ValueError, match="does not exist"):
        t.evolve_schema(drop=["a", "a"])  # second drop of same column fails


def test_fake_features_deterministic_and_bounded():
    v1 = _fake_features(b"hello world")
    v2 = _fake_features(b"hello world")
    assert v1 == v2
    assert len(v1) == FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in v1)


def test_extract_features_schema(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "defg")], "doc_id long, text string")
    out = extract_features(attach_payload(df))
    rows = out.collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert len(out.columns) == 2 + FEATURE_DIM


def test_sketches_within_tolerance(spark):
    """HLL++ and t-digest sketches can't bit-match another engine (different
    hash/algorithm), so they are bounded against exact answers instead of
    oracle-hashed: the 100 TB path for distinct counts and quantiles."""
    sf_dir = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3x the requested rsd

    row = li.select(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_sf_dir_trailing_slash(spark):
    from emr_apache_iceberg_workshop_spark.catalog import load_table

    a = load_table(spark, "/root/testdata/sf0.001", "nation").count()
    b = load_table(spark, "/root/testdata/sf0.001/", "nation").count()
    assert a == b == 25


def test_missing_sf_dir_fails_cleanly(spark):
    from pyspark.errors import AnalysisException
    from emr_apache_iceberg_workshop_spark.catalog import load_table

    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/sf_nope", "nation").count()


def test_connected_components_star_contraction_round_count(spark):
    """Large-star/small-star converges in O(log d) rounds: a 64-node chain
    (diameter 63 — min-label propagation would need ~63 rounds) resolves
    to one component in a handful of edge-set shuffles."""
    from emr_apache_iceberg_workshop_spark.operators.graph import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(63)], "u long, v long")
    labels, rounds = connected_components(chain)
    got = {(r.doc_id, r.label) for r in labels.collect()}
    assert got == {(i, 0) for i in range(64)}
    assert rounds <= 10  # sublinear in diameter; propagation needs 63

    # two components + an isolated self-loop (ignored)
    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (7, 7)], "u long, v long"
    )
    labels, _ = connected_components(edges)
    got = {(r.doc_id, r.label) for r in labels.collect()}
    assert got == {(3, 3), (5, 3), (9, 3), (20, 20), (21, 20)}


# -- IVF k-means index (round-3: real centroids replacing the label stand-in)


def test_ivf_kmeans_deterministic_and_recall():
    """VERDICT r2 #7 contract: the k-means index build is deterministic
    across runs, and multi-probe IVF recall@10 vs brute-force cosine is
    >= 0.5 on the sf0.001 fixture (probe=3 of K=8 clusters; the former
    ground-truth-label routing measured 0.12)."""
    from emr_apache_iceberg_workshop_spark.plans.similarity import (
        IVF_PROBE,
        K_IVF,
        _kmeans_centroids,
        s_cosine_topk,
        s_ivf_topk,
    )
    from emr_apache_iceberg_workshop_spark.session import build_session

    spark = build_session("ivf-test", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"

    c1, n1 = _kmeans_centroids(spark, sf)
    c2, n2 = _kmeans_centroids(spark, sf)
    assert c1 == c2 and n1 == n2  # bit-identical rebuild
    assert 1 <= len(c1) <= K_IVF and IVF_PROBE <= K_IVF

    brute = {(r.q_id, r.c_id) for r in s_cosine_topk(spark, sf).collect()}
    ivf = {(r.q_id, r.c_id) for r in s_ivf_topk(spark, sf).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"recall@10 {recall:.3f} < 0.5"


def test_multimodal_header_decode_real_formats():
    """The decode step parses REAL container headers: hand-built minimal
    PNG / GIF / JPEG / WAV byte streams yield their true dimensions, and
    unrecognized bytes fall back to the deterministic fake — both paths of
    the decoder contract."""
    import struct

    from emr_apache_iceberg_workshop_spark.operators.multimodal import _fake_decode

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 800, 600, 8, 2, 0, 0, 0)
        + b"\x00" * 4
    )
    assert _fake_decode(png) == {
        "byte_len": len(png), "width": 800, "height": 600, "n_frames": 1
    }

    gif = b"GIF89a" + struct.pack("<HH", 320, 240) + b"\x00" * 3
    g = _fake_decode(gif)
    assert (g["width"], g["height"]) == (320, 240)

    jpeg = (
        b"\xff\xd8\xff"
        + b"\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640)  # height, width
        + b"\x03" + b"\x00" * 9
    )
    j = _fake_decode(jpeg)
    assert (j["width"], j["height"]) == (640, 480)

    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
    )
    w = _fake_decode(wav)
    assert (w["width"], w["height"], w["n_frames"]) == (0, 0, 44100)

    # unrecognized bytes → deterministic fake (the fixtures' path)
    txt = "plain document text".encode()
    n = len(txt)
    assert _fake_decode(txt) == {
        "byte_len": n, "width": n % 640, "height": (n * 7) % 480, "n_frames": n % 30 + 1
    }


def test_multimodal_decode_through_spark_with_real_payloads(spark):
    """End-to-end through mapInPandas: a real PNG payload and a text
    payload in the same binary column decode to header metadata and fake
    metadata respectively."""
    import struct

    from emr_apache_iceberg_workshop_spark.operators.multimodal import decode_metadata

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 64, 32, 8, 2, 0, 0, 0)
        + b"\x00" * 4
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(b"just text"))],
        "doc_id long, modality string, payload binary",
    )
    got = {r.doc_id: (r.width, r.height) for r in decode_metadata(df).collect()}
    assert got[1] == (64, 32)
    assert got[2] == (len(b"just text") % 640, (len(b"just text") * 7) % 480)


def test_avro_codec_roundtrip_all_types(spark):
    """Record-level to_avro/from_avro (SURVEY F5): every supported type
    plus NULLs survives the binary round trip exactly."""
    from pyspark.sql import types as T

    from emr_apache_iceberg_workshop_spark.functions.avro_codec import (
        from_avro,
        spark_struct_to_avro_schema,
        to_avro,
    )

    schema = T.StructType([
        T.StructField("l", T.LongType(), False),
        T.StructField("i", T.IntegerType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("b", T.BooleanType(), True),
        T.StructField("y", T.BinaryType(), True),
    ])
    rows = [
        (1, 42, "héllo", 1.5, True, bytearray(b"\x00\xff")),
        (2, None, None, None, None, None),
        (-(2**60), -1, "", -0.0, False, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, schema)
    back = from_avro(to_avro(df), schema).orderBy("l")
    got = [tuple(r) for r in back.collect()]
    want = [tuple(r) for r in df.orderBy("l").collect()]
    assert got == want

    # nullable fields become [null, T] unions; required stay bare
    av = spark_struct_to_avro_schema(schema)
    by = {f["name"]: f["type"] for f in av["fields"]}
    assert by["l"] == "long" and by["i"] == ["null", "int"]


def test_bloom_filter_false_positives_dropped_by_exact_join(spark):
    """A deliberately under-sized bloom (64 bits for 40 keys) passes false
    positives; the exact join must still produce exactly the plain-join
    answer — the bloom is a pre-filter, never a correctness device."""
    from emr_apache_iceberg_workshop_spark.plans.bucketed import (
        bloom_build,
        bloom_filter,
    )

    small = spark.range(0, 40).selectExpr("id AS k")
    big = spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS v")
    bf = bloom_build(small, "k", bits=64)
    pre = bloom_filter(big, bf, "k", bits=64)
    n_pre = pre.count()
    assert n_pre > 40  # the tiny filter really does admit false positives
    joined = pre.join(small, "k")
    got = sorted(r["k"] for r in joined.collect())
    assert got == list(range(40))  # exact join drops every false positive

    # properly-sized filter: no false negatives either
    bf2 = bloom_build(small, "k", bits=1 << 16)
    pre2 = bloom_filter(big, bf2, "k", bits=1 << 16)
    assert sorted(r["k"] for r in pre2.join(small, "k").collect()) == list(range(40))


def test_manifests_table(spark, tmp_path):
    from emr_apache_iceberg_workshop_spark.tables import SnapshotTable

    t = SnapshotTable.create(
        spark, str(tmp_path / "mf"), "id bigint, part string", partition_by=["part"]
    )
    df = lambda rows: spark.createDataFrame(rows, "id bigint, part string")  # noqa: E731
    t.write(df([(1, "x"), (2, "y")]).coalesce(1))
    t.write(df([(3, "x")]).coalesce(1))
    rows = {r["snapshot_id"]: r for r in t.manifests_table().collect()}
    assert rows[1]["added_data_files"] == 2  # one file per partition
    assert rows[1]["added_rows"] == 2
    assert rows[1]["partition_summary"] == ["part=x", "part=y"]
    assert rows[2]["added_data_files"] == 1
    assert rows[2]["partition_summary"] == ["part=x"]
