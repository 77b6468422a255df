#!/usr/bin/env python3
"""Benchmark harness: headline extraction throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "extraction_pipeline_sec", "value": <sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>, "docs_per_sec": <n>, ...}

Env:
  SPARK_GRAFT_SF_DIR  table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_PAGES         override synthetic pages count for the pipeline bench

The headline metric is the north-star one: documents/sec through the full
extraction job (scan -> Arrow extract -> parquet write), on a synthetic
deterministic pages table sized to the SF.  Query timings force full
computation via the noop sink (count() would let Catalyst prune the very
projections being measured).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# benched queries: one per operator family (full list runs in pytest parity)
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "a1_monto_total",
    "a2_status_rollup",
    "w1_secuencia",
    "j1_equi_join",
    "c1_classify",
    "x1_extract_cedula",
    "n3_money_parse",
    "n4_date_es",
    "t_quality",
    "t_lang_id",
    "t_repetition",
    "t_curate_corpus",
    "d_exact_dedup",
    "d_minhash_sig",
    "d_minhash_lsh_near_dups",
    "d_simhash",
    "d_lsh_clusters_fast",
    "s_topk_cosine",
    "s_topk_batch",
    "s_topk_cosine_lsh",
    "s_ivf_assign",
    "s_ivf_search",
    "x8_enrich_inject",
    "pipeline_extract",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _pages_parquet(sf: float) -> tuple[str, int]:
    """Deterministic synthetic pages table sized to the SF (cached)."""
    n = int(os.environ.get("BENCH_PAGES", "0")) or max(2000, int(sf * 200_000))
    cache = os.path.join(HERE, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"pages_n{n}_seed42.parquet")
    if not os.path.exists(path):
        from ocr_sam_project_spark.sources.io import write_pages_parquet

        write_pages_parquet(path, n=n, seed=42)
    return path, n


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ocr-sam-project-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = _sf_from_dir(SF_DIR)

    # ---- headline: full extraction job over synthetic pages ----------------
    from ocr_sam_project_spark.pipeline.job import run_extraction_job

    pages_path, n_pages = _pages_parquet(sf)
    # warm the JVM/codegen/Arrow path first so the measured run is
    # steady-state (the driver compares per-round numbers)
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    run_extraction_job(spark, pages_path, warm_dir, run_id="warm", num_parts=CPUS)
    shutil.rmtree(warm_dir, ignore_errors=True)
    # best of 3 (the sandbox VM shows sporadic multi-second stalls)
    pipeline_sec, summary = None, None
    for rep in range(3):
        out_dir = tempfile.mkdtemp(prefix="bench_extract_")
        t0 = time.monotonic()
        s = run_extraction_job(
            spark, pages_path, out_dir, run_id=f"bench{rep}", num_parts=CPUS
        )
        el = time.monotonic() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        if pipeline_sec is None or el < pipeline_sec:
            pipeline_sec, summary = el, s
    docs_per_sec = summary["docs_in"] / summary["elapsed_sec"] if summary["elapsed_sec"] else 0.0

    # dedup-enabled variant: the 100 TB ordering (drop dups BEFORE paying
    # Python extraction) — reported so the dedup stage's cost is visible.
    # The synthetic corpus is duplicate-free, so the stage would otherwise
    # drop nothing; plant a deterministic ~10% duplicated slice (same text,
    # new url) so the benched run does the real work: detect, drop, and
    # SKIP the Arrow stage for every planted copy.
    from pyspark.sql import functions as _F

    # deterministic, so cached alongside the base corpus (same key scheme)
    dup_path = pages_path.replace(".parquet", "_dup.parquet")
    if not os.path.exists(dup_path):
        base_pages = spark.read.parquet(pages_path)
        planted = base_pages.filter(
            _F.pmod(_F.xxhash64("url"), _F.lit(10)) == 0
        ).withColumn("url", _F.concat(_F.col("url"), _F.lit("#dup")))
        base_pages.unionByName(planted).write.mode("overwrite").parquet(dup_path)
    dedup_sec, s_dd = None, None
    for rep in range(2):
        dd_dir = tempfile.mkdtemp(prefix="bench_dedup_")
        t0 = time.monotonic()
        s = run_extraction_job(
            spark, dup_path, dd_dir, run_id=f"dd{rep}", num_parts=CPUS, dedup="exact"
        )
        el = time.monotonic() - t0
        shutil.rmtree(dd_dir, ignore_errors=True)
        if dedup_sec is None or el < dedup_sec:
            dedup_sec, s_dd = el, s

    # ---- per-query timings --------------------------------------------------
    from ocr_sam_project_spark.queries import QUERY_FNS, _load

    # warm the SQL path once before timing: view registration + a scan that
    # touches the two big tables absorbs file-listing/codegen/JIT warm-up
    # (BENCH_r01's q1=19.7s was all warm-up, not plan cost)
    _load(spark, SF_DIR)
    for t in ("lineitem", "orders", "documents", "embeddings"):
        spark.table(t).write.format("noop").mode("overwrite").save()

    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERY_FNS[name]
        best = None
        for _rep in range(3):  # best-of-3: sporadic VM stalls
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            el = time.monotonic() - t0
            best = el if best is None or el < best else best
        qtimes[name] = round(best, 3)

    # ---- LSH two-phase: materialized signatures (the real scale shape) ----
    # ingest half: signature table built once (amortized over all queries);
    # query half: probe-only over the stored column — compare to brute
    # s_topk_cosine above.
    from pyspark.sql import functions as SF

    from ocr_sam_project_spark.operators.similarity import (
        rhp_signature_table,
        topk_cosine_lsh_probe,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(SF.col("vec_id") == 0).first().embedding]
    sig_dir = tempfile.mkdtemp(prefix="bench_sig_")
    # honesty split (BENCH_r02: driver saw 24.5 s here where BENCH.md said
    # 1.0 s — the gap was 32 Python workers cold-spawning under VM
    # contention on a 2000-row job, a ONE-TIME session cost, not sig math):
    # report the cold first pass AND the warm steady-state separately.
    t0 = time.monotonic()
    rhp_signature_table(emb).write.format("noop").mode("overwrite").save()
    qtimes["s_lsh_sig_build_cold"] = round(time.monotonic() - t0, 3)
    best = None
    for _rep in range(2):
        t0 = time.monotonic()
        rhp_signature_table(emb).write.mode("overwrite").parquet(sig_dir)
        el = time.monotonic() - t0
        best = el if best is None or el < best else best
    qtimes["s_lsh_sig_build_once"] = round(best, 3)
    sig_df = spark.read.parquet(sig_dir)
    best = None
    for _rep in range(3):
        t0 = time.monotonic()
        topk_cosine_lsh_probe(sig_df, qv, k=10).write.format("noop").mode("overwrite").save()
        el = time.monotonic() - t0
        best = el if best is None or el < best else best
    qtimes["s_lsh_probe_only"] = round(best, 3)
    shutil.rmtree(sig_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "extraction_pipeline_sec",
                "value": round(pipeline_sec, 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "docs_per_sec": round(docs_per_sec, 1),
                "pages": n_pages,
                "segments_out": summary["segments_out"],
                "errors": summary["errors"],
                "dedup_exact_pipeline_sec": round(dedup_sec, 3),
                "dedup_pages_in": s_dd["docs_in"] + s_dd["dups_dropped"],
                "dedup_dups_dropped": s_dd["dups_dropped"],
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
