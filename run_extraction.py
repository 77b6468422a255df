#!/usr/bin/env python3
"""spark-submit entry point for the extraction pipeline.

Canonical cluster invocation (the north_rule's deployment shape):

    zip -r /tmp/ocr_sam_project_spark.zip ocr_sam_project_spark
    spark-submit --master <cluster> \
        --py-files /tmp/ocr_sam_project_spark.zip \
        run_extraction.py PAGES_PATH OUT_DIR \
        [--run-id R] [--num-parts P] [--pages-per-doc K] \
        [--dedup exact|minhash]

Prints one JSON summary line.  Re-running with the same OUT_DIR resumes:
completed partitions are skipped via the lineage table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pages_path")
    ap.add_argument("out_dir")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--num-parts", type=int, default=32)
    ap.add_argument("--pages-per-doc", type=int, default=1)
    ap.add_argument("--dedup", choices=["exact", "minhash"], default=None,
                    help="pre-extract dedup stage: drop duplicate pages "
                         "before the Arrow extraction (dups_dropped lands "
                         "in lineage)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-sam-project-spark-extraction").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ocr_sam_project_spark.pipeline.job import run_extraction_job

    summary = run_extraction_job(
        spark,
        args.pages_path,
        args.out_dir,
        run_id=args.run_id,
        num_parts=args.num_parts,
        pages_per_doc=args.pages_per_doc,
        dedup=args.dedup,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
