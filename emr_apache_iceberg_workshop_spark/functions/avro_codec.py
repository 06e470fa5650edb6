"""`from_avro` / `to_avro` runtime functions (SURVEY §2.8 F5).

The reference imports Spark's Avro functions but never calls them
(`bronze-silver.py:15`); its actually-used Avro surface is the schema
converter (`schema_utils.py`). This module completes the IMPORTED surface
anyway: record-level Avro binary encode/decode as DataFrame operators,
built on the same spec-implemented binary codec the Iceberg manifest
writer uses (`iceberg_meta._enc_value`/`_dec_value` — public Avro spec,
no Avro library in this environment, and the pip pyspark distribution
ships no spark-avro jar either).

Execution shape: Arrow-batched `mapInPandas` with a per-record Python
encode loop — Avro's variable-length binary layout has no vectorized
form without a native library, so this is unavoidably the Python path.
That is acceptable here because (a) the reference itself never executes
these functions, and (b) real pipelines use Avro at the EDGE (Kafka
payloads, schema-registry messages), where the decode cost is part of
ingestion, not of the relational hot path. At 100 TB you would ship the
spark-avro jar and swap these for the native column functions — the
operator contract (binary column in, typed columns out) is identical.

Supported types: the reference's Avro lattice (SURVEY §1.2) — long, int,
string, double, float, boolean, bytes, nullable `[null, T]` unions.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T

from ..iceberg_meta import _Reader, _dec_value, _enc_value

_SPARK_TO_AVRO = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
}


def spark_struct_to_avro_schema(schema: T.StructType, name: str = "record0") -> dict:
    """StructType → Avro record schema (the inverse of
    `schema_utils.avro_schema_to_spark_schema`, over the same type
    lattice). Nullable fields become `[null, T]` unions."""
    fields = []
    for f in schema.fields:
        s = f.dataType.simpleString()
        if s not in _SPARK_TO_AVRO:
            raise ValueError(f"unsupported type for avro codec: {s}")
        t: object = _SPARK_TO_AVRO[s]
        if f.nullable:
            t = ["null", t]
        fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


def to_avro(df: DataFrame, payload_col: str = "avro") -> DataFrame:
    """Encode every row as one Avro-binary record (the `to_avro` runtime
    function at record granularity). Output: single binary column."""
    schema = spark_struct_to_avro_schema(df.schema)
    names = [f["name"] for f in schema["fields"]]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for rec in pdf[names].to_dict("records"):
                rec = {k: (None if pd.isna(v) else v) for k, v in rec.items()}
                buf = io.BytesIO()
                _enc_value(buf, schema, rec)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({payload_col: payloads})

    return df.mapInPandas(batches, schema=f"{payload_col} binary")


def from_avro(
    df: DataFrame, out_schema: T.StructType | str, payload_col: str = "avro"
) -> DataFrame:
    """Decode an Avro-binary column back into typed columns (the
    `from_avro` runtime function). `out_schema` is the reader schema —
    its Avro form must match the writer's (schema evolution beyond
    identical schemas is out of scope for this edge codec)."""
    if isinstance(out_schema, str):
        out_schema = T.StructType.fromDDL(out_schema)
    schema = spark_struct_to_avro_schema(out_schema)
    names = [f["name"] for f in schema["fields"]]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {n: [] for n in names}
            for payload in pdf[payload_col]:
                rec = _dec_value(_Reader(bytes(payload)), schema)
                for n in names:
                    cols[n].append(rec[n])
            yield pd.DataFrame(cols)

    return df.mapInPandas(batches, schema=out_schema)
