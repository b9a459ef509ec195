"""Batch sinks and layout: partitioned parquet, csv/json interchange.

The reference's sinks are log/Text/BigQuery writes [U/M]; the engine's
batch equivalents are columnar parquet (the default), with hive-style
partition layout as the 100 TB organizing principle: a table partitioned
on its natural pruning key (date, event_type, lang, ANN bucket) turns
selective queries into partial scans — Catalyst emits PartitionFilters
and never opens non-matching directories. Verified by plan assertion in
tests, not just claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-layout parquet: one directory per partition value. Choose
    low-cardinality, frequently-filtered keys; high-cardinality keys
    (user_id) belong in sort order within files, not directories."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Interchange sink (header'd CSV). Arrays/structs must be projected
    out or serialized first — CSV is for flat exports only."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema is mandatory: inference is a full extra pass at scale."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """Line-delimited JSON sink (nested types survive round-trip)."""
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Whole-object binary ingest via the built-in ``binaryFile``
    datasource: one row per object — (path, modificationTime, length,
    content BINARY) — the ingest boundary that feeds the multimodal
    ``with_media`` column contract (operators/multimodal.py). Scale
    shape: the reader parallelizes per object; ``pathGlobFilter`` prunes
    at LISTING time, so filtered objects are never opened — at 100 TB
    the media lake is read selectively by extension/prefix, not scanned."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
