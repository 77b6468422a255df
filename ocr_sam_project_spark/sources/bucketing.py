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


def bucketed_anti_join(
    spark: SparkSession, corpus_table: str, drop_table: str, key: str
) -> DataFrame:
    """Shuffle-free anti-join for the HIGH-DUP dedup regime.

    The pipeline's loser-set anti-join (pipeline/job.py) broadcasts the
    loser ids when they fit in spark.sql.autoBroadcastJoinThreshold.  At a
    10%-dup 100 TB corpus the loser set is terabytes — not broadcastable —
    and a plain anti-join degenerates into a full wide shuffle of the PAGES
    (html payload and all).  The storage-owned fix: keep the corpus bucketed
    by url at ingest (the Iceberg bucket(url, N) partition transform) and
    write the loser set bucketed identically (write_bucketed) — then this
    anti-join is a SortMergeJoin with NO Exchange on either side: each
    bucket pair streams locally, the pages never move."""
    return spark.table(corpus_table).join(
        spark.table(drop_table), key, "left_anti"
    )
