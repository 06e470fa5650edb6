"""Property-based tests (hypothesis) for the pure-Python layers.

The example-based suites pin known shapes; these pin INVARIANTS:

- `prune_keep` is SOUND for every monotone transform: a file whose
  partition value covers a row with source value v is never pruned by a
  predicate that admits v (false exclusion = silent wrong answers at
  scale — the worst failure class a manifest pruner can have).
- The spec-implemented Avro object-container codec round-trips arbitrary
  records (the Iceberg manifests external engines read are only as good
  as this codec).
- The façade's top-level splitter respects quotes/parens for arbitrary
  argument lists.

No SparkSession anywhere — the whole file runs in milliseconds.
"""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings, strategies as st

from emr_apache_iceberg_workshop_spark.partitioning import (
    parse_field, prune_keep, _py_transform,
)

_TS = st.datetimes(
    min_value=datetime(1, 1, 2), max_value=datetime(9999, 12, 30)
)


def _ordered(a, b):
    return (a, b) if a <= b else (b, a)


@settings(max_examples=300, deadline=None)
@given(v=_TS, a=_TS, b=_TS, tf=st.sampled_from(["days", "hours", "months", "years"]))
def test_time_transform_pruning_never_false_excludes(v, a, b, tf):
    lo, hi = _ordered(a, b)
    if not lo <= v <= hi:
        return
    field = parse_field(f"{tf}(ts)")
    dir_value = str(_py_transform(field, v))
    assert prune_keep(field, dir_value, lo, hi), (tf, v, lo, hi)


@settings(max_examples=300, deadline=None)
@given(
    v=st.integers(-(2**40), 2**40),
    a=st.integers(-(2**40), 2**40),
    b=st.integers(-(2**40), 2**40),
    w=st.sampled_from([1, 4, 10, 1000]),
)
def test_truncate_int_pruning_never_false_excludes(v, a, b, w):
    lo, hi = _ordered(a, b)
    if not lo <= v <= hi:
        return
    field = parse_field(f"truncate({w}, id)")
    dir_value = str(_py_transform(field, v))
    assert prune_keep(field, dir_value, lo, hi)


@settings(max_examples=300, deadline=None)
@given(
    v=st.text(alphabet="abcxyz0189", max_size=12),
    a=st.text(alphabet="abcxyz0189", max_size=12),
    b=st.text(alphabet="abcxyz0189", max_size=12),
    w=st.sampled_from([1, 3, 8]),
)
def test_truncate_string_pruning_never_false_excludes(v, a, b, w):
    lo, hi = _ordered(a, b)
    if not lo <= v <= hi:
        return
    field = parse_field(f"truncate({w}, s)")
    dir_value = str(_py_transform(field, v))
    assert prune_keep(field, dir_value, lo, hi)


@settings(max_examples=200, deadline=None)
@given(v=st.integers(0, 10**9), nb=st.sampled_from([4, 8, 16]))
def test_bucket_pruning_is_equality_only_and_exact(v, nb):
    field = parse_field(f"bucket({nb}, id)")
    bucket_of = lambda x: (x * 2654435761) % nb  # noqa: E731 (stand-in hash)
    b = bucket_of(v)
    # the file holding v's bucket is kept on v = v
    assert prune_keep(field, str(b), v, v, bucket_of=bucket_of)
    # every other bucket is provably empty of v
    for other in range(nb):
        if other != b:
            assert not prune_keep(field, str(other), v, v, bucket_of=bucket_of)
    # range predicates never prune hash buckets
    assert prune_keep(field, str(b), v, v + 1, bucket_of=bucket_of)


@settings(max_examples=200, deadline=None)
@given(vs=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=64))
def test_vectorized_bucket_hash_matches_scalar(vs):
    """The numpy write-path murmur3 agrees with the scalar spec-pinned
    implementation for the FULL int64 domain (the id-bucket case)."""
    import struct

    import numpy as np

    from emr_apache_iceberg_workshop_spark.partitioning import (
        _np_murmur3_long, murmur3_32,
    )

    arr = np.array(vs, dtype="int64")
    hashes = _np_murmur3_long(arr)
    for v, h in zip(vs, hashes):
        assert int(h) == murmur3_32(struct.pack("<q", v)) & 0xFFFFFFFF


@settings(max_examples=150, deadline=None)
@given(
    v=st.integers(-(2**40), 2**40),
    bound=st.integers(-(2**40), 2**40),
    w=st.integers(1, 1000),
    side=st.sampled_from(["lo", "hi"]),
)
def test_one_sided_truncate_pruning_never_false_excludes(v, bound, w, side):
    """One-sided predicates (the prune_keep crash class fixed in round 7)
    stay SOUND: a file covering v is never pruned by a one-sided
    predicate v satisfies."""
    field = parse_field(f"truncate({w}, n)")
    dirv = str(_py_transform(field, v))
    if side == "lo" and v >= bound:
        assert prune_keep(field, dirv, bound, None)
    if side == "hi" and v <= bound:
        assert prune_keep(field, dirv, None, bound)


@settings(max_examples=150, deadline=None)
@given(
    v=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), min_size=1,
        max_size=24,
    ),
    bound=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=24
    ),
    w=st.integers(1, 8),
    side=st.sampled_from(["lo", "hi"]),
)
def test_one_sided_truncate_string_pruning_never_false_excludes(v, bound, w, side):
    field = parse_field(f"truncate({w}, s)")
    dirv = _py_transform(field, v)
    if side == "lo" and v >= bound:
        assert prune_keep(field, dirv, bound, None)
    if side == "hi" and v <= bound:
        assert prune_keep(field, dirv, None, bound)


_REC = st.fixed_dictionaries(
    {
        "k": st.integers(-(2**62), 2**62),
        "name": st.text(max_size=40),
        "opt": st.one_of(st.none(), st.integers(-(2**31), 2**31)),
    }
)


@settings(max_examples=100, deadline=None)
@given(records=st.lists(_REC, max_size=25))
def test_avro_container_roundtrip(tmp_path_factory, records):
    from emr_apache_iceberg_workshop_spark.iceberg_meta import (
        read_avro_container, write_avro_container,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "opt", "type": ["null", "int"], "default": None},
        ],
    }
    path = str(tmp_path_factory.mktemp("avro") / "c.avro")
    write_avro_container(path, schema, records)
    got_schema, _meta, got = read_avro_container(path)
    assert got == records
    assert got_schema["name"] == "r"


@settings(max_examples=200, deadline=None)
@given(
    parts=st.lists(
        st.text(alphabet="abz019_ ", min_size=1, max_size=10).filter(
            lambda s: s.strip()
        ),
        min_size=1,
        max_size=6,
    )
)
def test_split_top_splits_plain_lists(parts):
    from emr_apache_iceberg_workshop_spark.sqlext import _split_top

    joined = ",".join(parts)
    assert _split_top(joined) == [p.strip() for p in parts]


@settings(max_examples=200, deadline=None)
@given(inner=st.text(alphabet="abz019, ", max_size=15))
def test_split_top_respects_parens_and_quotes(inner):
    from emr_apache_iceberg_workshop_spark.sqlext import _split_top

    # commas inside parens or quotes never split
    assert _split_top(f"f({inner}),g") == [f"f({inner})", "g"]
    q = inner.replace("'", "")
    assert _split_top(f"'{q}',x") == [f"'{q}'", "x"]


@settings(max_examples=500, deadline=None)
@given(n=st.integers(-(2**63), 2**63 - 1))
def test_zigzag_varint_roundtrip_full_int64(n):
    import io

    from emr_apache_iceberg_workshop_spark.iceberg_meta import _Reader, enc_long

    buf = io.BytesIO()
    enc_long(buf, n)
    assert _Reader(buf.getvalue()).long() == n


def _spark_types():
    from pyspark.sql import types as T

    return st.sampled_from(
        [T.LongType(), T.IntegerType(), T.DoubleType(), T.FloatType(),
         T.StringType(), T.BooleanType(), T.DateType(), T.TimestampType(),
         T.BinaryType(), T.DecimalType(12, 2),
         T.ArrayType(T.DoubleType()), T.ArrayType(T.StringType())]
    )


@settings(max_examples=100, deadline=None)
@given(
    cols=st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh_", min_size=1, max_size=8),
            st.deferred(_spark_types),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda c: c[0],
    )
)
def test_iceberg_schema_assigns_unique_ids(cols):
    from pyspark.sql import types as T

    from emr_apache_iceberg_workshop_spark.iceberg_meta import iceberg_schema

    schema = T.StructType([T.StructField(n, dt) for n, dt in cols])
    js, ids = iceberg_schema(schema)
    assert js["type"] == "struct"
    field_ids = [f["id"] for f in js["fields"]]
    # column ids are unique, and list element-ids never collide with them
    elem_ids = [
        f["type"]["element-id"] for f in js["fields"]
        if isinstance(f["type"], dict)
    ]
    assert len(set(field_ids)) == len(field_ids)
    assert not set(field_ids) & set(elem_ids)
    assert set(ids.values()) == set(field_ids)
    assert [f["name"] for f in js["fields"]] == [n for n, _t in cols]
