"""Structured Streaming variant: same extract_stage, streaming execution,
exactly-once file sink — output must equal the batch run."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.mark.timeout(300)
def test_stream_matches_batch(spark, tmp_path):
    from ocr_sam_project_spark.pipeline.stages import extract_stage
    from ocr_sam_project_spark.sources.io import write_pages_parquet
    from ocr_sam_project_spark.streaming.stream_job import start_extraction_stream

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # two "arriving" files
    write_pages_parquet(f"{in_dir}/part1.parquet", n=60, seed=42)
    write_pages_parquet(f"{in_dir}/part2.parquet", n=40, seed=7)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extraction_stream(spark, in_dir, out_dir, ckpt, pages_per_doc=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = spark.read.parquet(out_dir)
    batch = extract_stage(spark.read.parquet(in_dir))
    cols = ["url", "seg_no", "extracted_text", "doc_type", "monto_total", "error"]
    assert streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(streamed.select(cols)).count() == 0

    # restart with the same checkpoint: no new input -> no duplicate output
    n_before = streamed.count()
    q2 = start_extraction_stream(spark, in_dir, out_dir, ckpt, pages_per_doc=1)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out_dir).count() == n_before

    shutil.rmtree(in_dir, ignore_errors=True)
