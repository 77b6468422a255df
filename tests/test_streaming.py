"""Structured Streaming variant: same extract_stage, streaming execution,
exactly-once file sink — output must equal the batch run."""

from __future__ import annotations

import os
import shutil

import threading

import pytest
from pyspark.sql import functions as F


def _process_all(q, timeout_sec: int = 240) -> None:
    """processAllAvailable with a REAL deadline: pytest-timeout is not
    installed (a bare @pytest.mark.timeout was a silent no-op), so a hung
    streaming query would stall the whole suite.  Runs the blocking call on
    a worker thread; on expiry stops the query and fails the test."""
    err: list[BaseException] = []

    def run():
        try:
            q.processAllAvailable()
        except BaseException as e:  # surfaced after join
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        q.stop()
        pytest.fail(f"streaming query hung > {timeout_sec}s")
    if err:
        raise err[0]


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
        _process_all(q)
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
        _process_all(q2)
    finally:
        q2.stop()
    assert spark.read.parquet(out_dir).count() == n_before

    shutil.rmtree(in_dir, ignore_errors=True)


def test_streaming_dedup_first_wins(spark, tmp_path):
    """Stateful streaming dedup: across micro-batches, only the FIRST page
    per text fingerprint survives; empty-text pages bypass dedup (each must
    reach quarantine individually)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from ocr_sam_project_spark.sources.io import PAGES_ARROW_SCHEMA
    from ocr_sam_project_spark.streaming.stream_job import deduped_pages

    T = datetime(2025, 1, 1, 10, 0)

    def page(url, text):
        return {"url": url, "warc_ts": T, "html": None, "text": text, "lang": "es"}

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 1: two distinct texts + one in-batch duplicate + one empty
    b1 = [
        page("a://1", "texto unico primero"),
        page("a://2", "otro texto distinto"),
        page("a://3", "Texto   UNICO primero"),  # canonical dup of a://1
        page("a://e1", "   "),
    ]
    # batch 2 (separate file -> later micro-batch): cross-batch dup + empty
    b2 = [page("b://4", "texto unico primero"), page("b://e2", "")]
    pq.write_table(pa.Table.from_pylist(b1, schema=PAGES_ARROW_SCHEMA), str(in_dir / "b1.parquet"))
    pq.write_table(pa.Table.from_pylist(b2, schema=PAGES_ARROW_SCHEMA), str(in_dir / "b2.parquet"))
    # FileStreamSource orders micro-batches by file MODIFICATION TIME, and
    # two writes can land in the same mtime tick — a tie lets b2 process
    # first and batch-2's url win the fingerprint state (seen once in a
    # contended full-suite run).  Pin the order explicitly.
    import os as _os

    _os.utime(str(in_dir / "b1.parquet"), (1_000_000_000, 1_000_000_000))

    pages = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        deduped_pages(pages)
        .writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").start()
    )
    try:
        _process_all(q)
        got = {r.url for r in spark.sql("SELECT url FROM dedup_stream").collect()}
    finally:
        q.stop()
    # one survivor per fingerprint, empties pass
    assert {"a://2", "a://e1", "b://e2"} <= got
    # IN-batch duplicate pair: dropDuplicates keeps exactly ONE of the two
    # (which one is not defined within a micro-batch — scheduling-dependent)
    assert len({"a://1", "a://3"} & got) == 1
    # CROSS-batch duplicate: deterministic — batch-1 state always wins
    assert "b://4" not in got


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time windowed rollup with watermark: a row arriving AFTER its
    window finalized is dropped — the emitted count never changes."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from ocr_sam_project_spark.sources.io import PAGES_ARROW_SCHEMA
    from ocr_sam_project_spark.streaming.stream_job import windowed_page_counts

    def page(i, ts):
        return {
            "url": f"wm://{i}", "warc_ts": ts,
            "html": None, "text": f"texto {i}", "lang": "es",
        }

    T = lambda m: datetime(2025, 1, 1, 10, m)  # noqa: E731
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 1: three rows in window [10:00,10:10) + one at 10:20 that pushes
    # the watermark past 10:10, finalizing the first window at count=3
    rows1 = [page(0, T(1)), page(1, T(4)), page(2, T(9)), page(3, T(20))]
    pq.write_table(pa.Table.from_pylist(rows1, schema=PAGES_ARROW_SCHEMA),
                   str(in_dir / "b1.parquet"))

    pages = (
        spark.readStream.schema("url string, warc_ts timestamp, html binary,"
                                " text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        windowed_page_counts(pages, window="10 minutes", watermark="0 seconds")
        .writeStream.format("memory").queryName("wm_counts")
        .outputMode("append").start()
    )
    try:
        _process_all(q)
        got1 = {
            (r.win_start.minute, r.n_pages)
            for r in spark.sql("SELECT * FROM wm_counts").collect()
        }
        assert (0, 3) in got1, f"first window should finalize at 3, got {got1}"

        # batch 2: one LATE row for the closed [10:00,10:10) window (dropped)
        # + one at 10:31 advancing the watermark past 10:30
        rows2 = [page(4, T(5)), page(5, T(31))]
        pq.write_table(pa.Table.from_pylist(rows2, schema=PAGES_ARROW_SCHEMA),
                       str(in_dir / "b2.parquet"))
        _process_all(q)
        final = {
            (r.win_start.minute, r.n_pages)
            for r in spark.sql("SELECT * FROM wm_counts").collect()
        }
    finally:
        q.stop()
    # the late 10:05 row did NOT reopen/augment the finalized window...
    assert (0, 3) in final and (0, 4) not in final
    # ...and the 10:20 window finalized (count 1) once the watermark passed
    assert (20, 1) in final


def test_streaming_hll_matches_batch(spark, tmp_path):
    """The HLL register table is a plain (groupBy bucket -> MAX) aggregate,
    so it runs UNDER STRUCTURED STREAMING for free in complete mode — the
    live-distinct-count dashboard shape.  Registers after all files arrive
    must equal the batch sketch (=> identical estimates), which also pins
    that the sketch state is bounded at 2^p rows."""
    import os

    from ocr_sam_project_spark.operators.sketches import hll_estimate, hll_registers
    from ocr_sam_project_spark.sources.io import write_pages_parquet

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    write_pages_parquet(f"{in_dir}/part1.parquet", n=60, seed=42)
    write_pages_parquet(f"{in_dir}/part2.parquet", n=40, seed=7)

    batch_df = spark.read.parquet(in_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(in_dir)
    regs = hll_registers(stream, F.col("url"), p=8)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .start()
    )
    try:
        _process_all(q)
    finally:
        q.stop()

    streamed = spark.table("hll_regs")
    batch = hll_registers(batch_df, F.col("url"), p=8)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    assert (
        hll_estimate(streamed, p=8).first().est_distinct
        == hll_estimate(batch, p=8).first().est_distinct
    )


def test_streaming_cm_sketch_matches_batch(spark, tmp_path):
    """Count-Min cells are a plain (groupBy -> COUNT) aggregate, so the
    sketch builds under Structured Streaming complete mode with d*w-row
    state — the live heavy-hitter dashboard shape."""
    import os

    import pyspark.sql.functions as SF

    from ocr_sam_project_spark.operators.sketches import cm_sketch
    from ocr_sam_project_spark.sources.io import write_pages_parquet

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    write_pages_parquet(f"{in_dir}/part1.parquet", n=50, seed=42)
    write_pages_parquet(f"{in_dir}/part2.parquet", n=50, seed=7)

    batch_df = spark.read.parquet(in_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(in_dir)
    q = (
        cm_sketch(stream, SF.col("lang"), d=3, w=64)
        .writeStream.format("memory")
        .queryName("cm_cells")
        .outputMode("complete")
        .start()
    )
    try:
        _process_all(q)
    finally:
        q.stop()
    streamed = spark.table("cm_cells")
    batch = cm_sketch(batch_df, SF.col("lang"), d=3, w=64)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
