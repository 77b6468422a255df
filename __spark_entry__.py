"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the full extraction pipeline (Arrow-batched
                 boilerplate-strip/segment -> classify -> regex-bank extract
                 -> normalize -> validate) over the sf0.001 documents table,
                 summarized per doc_type.
queries()      — one entry per implemented operator from SURVEY.md §2 plus
                 the training-data operators (dedup / similarity / textstats
                 / multimodal), from ocr_sam_project_spark.queries.
oracle_sql()   — exact DuckDB twins for every SQL-expressible query; the
                 full-pipeline and LSH (recall<1) queries are rows-only by
                 design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make ocr_sam_project_spark importable in executor python workers even
    when the driver wasn't launched from this directory (the local-mode
    equivalent of `spark-submit --py-files`)."""
    import shutil
    import tempfile

    marker = "_ocr_sam_project_spark_shipped"
    if getattr(spark, marker, False):
        return
    zip_base = os.path.join(tempfile.gettempdir(), "ocr_sam_project_spark_pkg")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(zip_base, "zip", root_dir=_HERE, base_dir="ocr_sam_project_spark")
    spark.sparkContext.addPyFile(zip_path)
    setattr(spark, marker, True)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    from ocr_sam_project_spark.pipeline.stages import extract_stage
    from ocr_sam_project_spark.queries import _legal_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # graft the deterministic pseudo-oficio header onto each document so the
    # full extractor chain (classify -> fields -> persons -> validate) has
    # real structure to find; the synthesized content is Spanish -> lang 'es'.
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("binary").alias("html"),
        F.concat(F.expr(_legal_text("doc_id")), F.lit(" "), F.col("text")).alias("text"),
        F.lit("es").alias("lang"),
    )
    ex = extract_stage(pages)
    return (
        ex.groupBy("doc_type", "tramite", "departamento")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_personas").alias("n_personas"),
            F.round(F.sum("monto_total"), 2).alias("monto_total"),
            F.round(F.avg("validation_score"), 6).alias("avg_validation"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
        .orderBy("doc_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ocr_sam_project_spark.queries import QUERY_FNS

    def _wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: _wrap(fn) for name, fn in QUERY_FNS.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins (ANSI SQL) for every SQL-expressible query."""
    from ocr_sam_project_spark.queries import ORACLES

    return dict(ORACLES)
