"""Physical-plan hygiene — the 100 TB guards (SURVEY.md §4).

Asserts the properties that matter at scale, read from .explain output:
column pruning reaches the scan, filters push down, small joins broadcast,
aggregations have a map-side partial phase, and the extraction path stays
shuffle-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pages_scan_prunes_unused_columns(spark, pages_parquet):
    from ocr_sam_project_spark.pipeline.stages import extract_stage

    pages = spark.read.parquet(pages_parquet)
    plan = _plan(extract_stage(pages))
    # warc_ts is never used by extraction -> must not reach the scan
    assert "warc_ts" not in plan.split("ReadSchema")[-1], plan


def test_filter_pushdown_reaches_scan(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    plan = _plan(pages.filter(F.col("lang") == "es").select("url"))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,es)]" in plan or (
        "PushedFilters" in plan and "EqualTo(lang,es)" in plan
    ), plan


def test_j1_join_broadcasts_small_side(spark):
    from ocr_sam_project_spark.queries import QUERY_FNS

    df = QUERY_FNS["j1_equi_join"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_a1_agg_has_partial_phase(spark):
    from ocr_sam_project_spark.queries import QUERY_FNS

    df = QUERY_FNS["a1_monto_total"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # map-side combine: a partial HashAggregate before the exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_" in plan.lower() or "partial" in plan, plan


def test_whole_stage_codegen_covers_native_queries(spark):
    from ocr_sam_project_spark.queries import QUERY_FNS

    df = QUERY_FNS["c1_classify"](spark, "/root/testdata/sf0.001")
    df.collect()  # AQE: codegen spans only appear in the final plan
    plan = _plan(df)
    # whole-stage-codegen stages print as '*(n)' in the simple plan form
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan


def test_dedup_exact_single_shuffle(spark):
    from ocr_sam_project_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(exact_dedup(docs))
    # one hash-partitioned exchange on fp, nothing else
    assert plan.count("Exchange hashpartitioning") == 1, plan
