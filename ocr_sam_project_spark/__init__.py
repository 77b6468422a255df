"""ocr_sam_project_spark — a from-scratch PySpark-native rebuild of the
extraction capabilities of CiberneticaFabrica/ocr-sam-project.

Layout
------
extraction/   pure Python (no Spark imports): regex banks, HTML boilerplate
              strip, page segmentation, classifier, field/person extractors,
              normalizers.  Unit-testable without a SparkSession.
pipeline/     Spark layer: schemas, Arrow-batched stages (mapInPandas /
              pandas_udf), the end-to-end job, lineage + checkpoint-resume.
operators/    large-scale training-data ops: dedup (exact/minhash/simhash/
              ngram-jaccard), similarity search, text analysis.
sources/      synthetic deterministic pages generator + parquet IO.
streaming/    Structured Streaming variant of the extraction pipeline.

Design stance (SURVEY.md §7): the reference's Lambda/SQS/DynamoDB topology
dissolves; the computation (segment -> classify -> extract -> normalize ->
validate -> aggregate -> track) is re-expressed as declarative DataFrame
plans plus vectorized Arrow stages.  No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
