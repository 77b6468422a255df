"""Bucketed (co-located) tables — the shuffle-free repeated-join strategy.

At 100 TB, any table joined repeatedly on the same key (e.g. extractions ⋈
entities on url, or orders ⋈ lineitem on orderkey) should be written
bucketed on that key: both sides land in matching bucket files and every
subsequent join skips the shuffle entirely (no Exchange in the plan).

Plain parquet paths can't carry bucket metadata, so these go through the
session catalog (`saveAsTable`) — the Iceberg equivalent is a bucket(key, N)
partition transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, sort: bool = True
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planner
    produces a SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
