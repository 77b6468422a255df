"""Structured Streaming variant of the extraction pipeline.

The reference is an event-driven incremental pipeline (S3 event -> SQS ->
Lambda, SURVEY.md §2.11); its streaming semantics map to:

* SQS at-least-once + idempotent keyed writes  ->  Spark checkpointed
  exactly-once file-sink (or foreachBatch MERGE at real scale)
* per-message processing                        ->  micro-batch of Arrow batches
* DLQ                                           ->  `error` column quarantine
* DynamoDB state                                ->  streaming query checkpoint +
                                                    the lineage table

The same extract_stage powers batch and streaming — one code path, two
execution modes (the core Structured Streaming promise).  Watermarks are not
required (the reference has no event-time windows); `withWatermark` can bound
state if windowed rollups are added downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.schema import PAGES_SCHEMA
from ..pipeline.stages import extract_stage


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a directory of pages parquet files — the
    analog of new S3 objects arriving (document_processor/app.py:63-84)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def windowed_page_counts(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Event-time tumbling-window page counts with a watermark bounding
    state — the late-data policy for streaming rollups (ingest-rate metrics,
    the CloudWatch dashboard analog): a window finalizes once the watermark
    (max event time - `watermark`) passes its end, and rows arriving later
    than that are DROPPED rather than reopening emitted results.

    Works on a streaming OR batch `pages` frame (withWatermark is a no-op in
    batch), keeping the one-code-path property."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "n_pages")
    )


def deduped_pages(
    pages: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST page per text fingerprint —
    the incremental counterpart of the batch pre-extract dedup stage
    (pipeline.job run_extraction_job(dedup="exact")).

    dropDuplicatesWithinWatermark on (fp) gives GENUINELY watermark-bounded
    state: a fingerprint's state row is evicted once the watermark passes
    its event time + horizon, so two copies arriving within `watermark` of
    each other dedup, while a copy re-crawled after the horizon is admitted
    again (and the state table stays bounded by the horizon's page volume —
    a plain dropDuplicates(['_fp']) would key state by fp FOREVER, growing
    one row per distinct page ever seen).  "First" is guaranteed ACROSS
    micro-batches (earlier batch populates state); within a single
    micro-batch Spark keeps an arbitrary one of the tied rows.  At web
    scale the horizon is the re-crawl window; an unbounded exact dedup is
    the batch compaction job (or dedup_against_store) over the stored
    corpus instead — state can't hold 10^12 keys.
    Empty/whitespace texts bypass dedup (they all share one fp but are NOT
    duplicates — each must reach quarantine with its own url), mirroring the
    batch stage's guard."""
    from ..operators.textstats import fingerprint

    dedupable = pages.filter(F.length(F.trim(F.col("text"))) > 0).withColumn(
        "_fp", fingerprint(F.col("text"))  # same canonical fp as batch dedup
    )
    deduped = dedupable.withWatermark("warc_ts", watermark)
    # batch frames keep the one-code-path property: WithinWatermark is a
    # streaming-only operator, and in batch the horizon is irrelevant anyway
    deduped = (
        deduped.dropDuplicatesWithinWatermark(["_fp"])
        if deduped.isStreaming
        else deduped.dropDuplicates(["_fp"])
    )
    kept = deduped.drop("_fp")
    passthrough = pages.filter(
        F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)
    )
    return kept.unionByName(passthrough)


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    pages_per_doc: int = 1,
) -> StreamingQuery:
    """Continuous extraction: stream in pages, run the SAME extract_stage,
    append to the extractions sink with exactly-once checkpointing."""
    pages = read_pages_stream(spark, input_dir)
    extracted = extract_stage(pages, pages_per_doc)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
