"""Iceberg-style partition TRANSFORMS on plain parquet.

The reference corpus at real scale lives in an Iceberg table partitioned by
days(warc_ts) / bucket(url) (io.py header; BASELINE.json input_hint).  This
sandbox has no Iceberg runtime jar, but the two properties the pipeline
actually needs from those transforms are reproducible on vanilla parquet:

* a DERIVED partition column written with ``partitionBy`` gives
  directory-level layout, and
* a filter expressed ON THE TRANSFORM gives partition PRUNING — the scan
  plan lists only matching directories (``PartitionFilters`` in explain),
  so a point lookup touches 1/N of a 100 TB table's files before a single
  row is read.

The transforms mirror Iceberg's semantics:

* ``bucket_transform(col, n)`` — hash-bucket (Iceberg uses murmur3; we use
  xxhash64 — any uniform deterministic hash gives the same layout property).
* ``days_transform(ts)``     — date truncation.

Helper ``partitioned_write`` / ``pruned_lookup`` pair a write layout with
the filter shape that provably prunes it (plan-tested in test_plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_transform(col: Column, n_buckets: int) -> Column:
    """Iceberg bucket(n, col) analog: uniform deterministic hash bucket.
    Non-negative, stable across runs/engines that share xxhash64."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def days_transform(ts: Column) -> Column:
    """Iceberg days(ts) analog: the date of the timestamp."""
    return F.to_date(ts)


def partitioned_write(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write with the Common-Crawl layout: days(warc_ts) / bucket(url).
    Re-deriving the transform columns at read time lets any filter on
    (day, url-bucket) prune directories instead of scanning them."""
    (
        df.withColumn("p_day", days_transform(F.col(ts_col)))
        .withColumn("p_bucket", bucket_transform(F.col(url_col), n_buckets))
        .write.mode(mode)
        .partitionBy("p_day", "p_bucket")
        .parquet(path)
    )


def pruned_lookup(
    spark: SparkSession,
    path: str,
    url: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Point lookup by url that PRUNES: the bucket of the literal url is
    computed with the same transform and pushed as a partition filter, so
    only 1/n_buckets of the table's directories are even listed."""
    bucket = (
        spark.range(1)
        .select(bucket_transform(F.lit(url), n_buckets).alias("b"))
        .first()
        .b
    )
    df = spark.read.parquet(path)
    return df.filter((F.col("p_bucket") == int(bucket)) & (F.col("url") == url))
