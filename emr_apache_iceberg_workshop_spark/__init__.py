"""PySpark-native analytics engine with the capabilities of the
soumilshah1995/emr-apache-iceberg-workshop reference (see SURVEY.md).

Spark-first re-build: declarative DataFrame/SQL plans optimized by
Catalyst, snapshot-versioned parquet tables standing in for Iceberg
(no iceberg-spark-runtime jar in this environment), and an extended
operator surface for large-scale training-data pipelines (dedup,
similarity search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"
