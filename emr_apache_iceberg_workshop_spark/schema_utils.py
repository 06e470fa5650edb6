"""Avro JSON schema → Spark StructType converter.

Behavior parity with the reference's `avro_schema_to_spark_schema`
(`bronze-silver.py:22-57`): primitive map, logical timestamp-micros/date
(plain and dict forms), `[null, T]` nullable unions, unknown → StringType
fallback (SURVEY.md §1.2 table)."""

from __future__ import annotations

from pyspark.sql import types as T

_PRIMITIVES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}

_LOGICAL = {
    "timestamp-micros": T.TimestampType(),
    "timestamp-millis": T.TimestampType(),
    "date": T.DateType(),
}


def _convert_type(avro_type) -> tuple[T.DataType, bool]:
    """Returns (spark_type, nullable)."""
    if isinstance(avro_type, str):
        if avro_type in _LOGICAL:  # reference accepts bare logical names too
            return _LOGICAL[avro_type], False
        return _PRIMITIVES.get(avro_type, T.StringType()), avro_type == "null"
    if isinstance(avro_type, dict):
        logical = avro_type.get("logicalType")
        if logical in _LOGICAL:
            return _LOGICAL[logical], False
        return _convert_type(avro_type.get("type", "string"))
    if isinstance(avro_type, list):  # union — [null, T] → nullable T
        non_null = [t for t in avro_type if t != "null"]
        nullable = len(non_null) < len(avro_type)
        inner, _ = _convert_type(non_null[0] if non_null else "string")
        return inner, nullable
    return T.StringType(), True


def avro_schema_to_spark_schema(avro_schema: dict) -> T.StructType:
    fields = []
    for f in avro_schema.get("fields", []):
        dtype, nullable = _convert_type(f["type"])
        fields.append(T.StructField(f["name"], dtype, nullable))
    return T.StructType(fields)
