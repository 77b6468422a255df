#!/usr/bin/env python3
"""Benchmark harness: headline extraction throughput + per-query timings.

Prints TWO JSON lines:
  1. the FULL line — {"metric": ..., "value": ..., "queries": {...},
     "spread": {...}, "stall_reruns": [...]} — every rep's spread for
     honesty/diagnosis (BENCH.md reads this one);
  2. a COMPACT line (<1000 chars), printed LAST, holding just the headline
     fields.  The correctness driver captures only a 2000-char stdout TAIL,
     and BENCH_r04's full line grew past 3000 chars — the head (metric/value)
     was truncated away and the round's number recorded as parsed:null.  The
     compact last line is the driver's parse target; the detail stays above.

Env:
  SPARK_GRAFT_SF_DIR  table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_PAGES         override synthetic pages count for the pipeline bench

The headline metric is the north-star one: documents/sec through the full
extraction job (scan -> Arrow extract -> parquet write), on a synthetic
deterministic pages table sized to the SF.  Query timings force full
computation via the noop sink (count() would let Catalyst prune the very
projections being measured).

Contention robustness (BENCH_r03 recorded a 20.2 s headline in a window
where the same file's pipeline_extract measured 2.7 s — a VM stall, not a
plan change): every entry is timed over INTERLEAVED rounds (rep 1 of every
entry, then rep 2 of every entry, ...) so a single contended window cannot
own all reps of one entry; the reported number is the MEDIAN of reps, with
min/max spread published in the JSON; any entry whose spread exceeds 3x
(max > 3*min) gets extra reps appended before the median is taken.
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
    "t_line_dedup",
    "t_span_dedup",
    "t_decontaminate",
    "t_domain_cap",
    "t_pii_scrub",
    "t_intra_doc_dedup",
    "t_boilerplate_strip",
    "t_unigram_logprob",
    "d_exact_dedup",
    "d_dedup_against_store",
    "d_url_dedup",
    "d_minhash_sig",
    "d_minhash_lsh_near_dups",
    "d_near_store_fast",
    "d_simhash",
    "d_lsh_clusters_fast",
    "t_gopher_rules",
    "t_dup_ngram_frac",
    "g_link_extract",
    "g_host_degrees",
    "g_blocklist",
    "g_host_rank",
    "g_host_components",
    "g_html_text",
    "d_bloom_store_dedup",
    "g_wet_curate",
    "s_quantize",
    "s_topk_quantized",
    "g_crawl_diff",
    "t_corpus_stats",
    "t_ccnet_buckets",
    "a_hll_distinct",
    "a_cm_topk_terms",
    "g_crawl_to_shards",
    "t_bm25_topk",
    "g_robots_filter",
    "t_bigram_logprob",
    "s_kmeans",
    "s_topk_cosine",
    "s_topk_batch",
    "s_topk_cosine_lsh",
    "s_ivf_assign",
    "s_ivf_search",
    "s_semantic_dedup",
    "x8_enrich_inject",
    "pipeline_extract",
]

QUERY_ROUNDS = 3  # interleaved reps per query entry
HEADLINE_ROUNDS = 5  # the driver-graded number gets median-of-5
STALL_SPREAD = 3.0  # max/min beyond this => contended window hit; extra reps
EXTRA_REPS = 2


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


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

    from pyspark.sql import functions as SF

    from ocr_sam_project_spark.operators.similarity import (
        rhp_signature_table,
        topk_cosine_lsh_probe,
    )
    from ocr_sam_project_spark.pipeline.job import run_extraction_job
    from ocr_sam_project_spark.queries import QUERY_FNS, _load

    pages_path, n_pages = _pages_parquet(sf)

    # dedup-enabled variant input: the 100 TB ordering (drop dups BEFORE
    # paying Python extraction).  The synthetic corpus is duplicate-free, so
    # plant a deterministic ~10% duplicated slice (same text, new url) so the
    # benched run does real work: detect, drop, and SKIP the Arrow stage for
    # every planted copy.
    dup_path = pages_path.replace(".parquet", "_dup.parquet")
    if not os.path.exists(dup_path):
        base_pages = spark.read.parquet(pages_path)
        planted = base_pages.filter(
            SF.pmod(SF.xxhash64("url"), SF.lit(10)) == 0
        ).withColumn("url", SF.concat(SF.col("url"), SF.lit("#dup")))
        base_pages.unionByName(planted).write.mode("overwrite").parquet(dup_path)

    # ---- warm-up ----------------------------------------------------------
    # one full extraction job warms the JVM/codegen/Arrow python workers; a
    # noop scan of the big tables absorbs file-listing/codegen warm-up
    # (BENCH_r01's q1=19.7s was all warm-up, not plan cost)
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    run_extraction_job(spark, pages_path, warm_dir, run_id="warm", num_parts=CPUS)
    shutil.rmtree(warm_dir, ignore_errors=True)
    _load(spark, SF_DIR)
    for t in ("lineitem", "orders", "documents", "embeddings"):
        spark.table(t).write.format("noop").mode("overwrite").save()

    # ---- LSH cold build: one-time session cost, measured exactly once ----
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(SF.col("vec_id") == 0).first().embedding]
    sig_dir = tempfile.mkdtemp(prefix="bench_sig_")
    # honesty split (BENCH_r02: driver saw 24.5 s here where BENCH.md said
    # 1.0 s — 32 Python workers cold-spawning under VM contention, a
    # ONE-TIME session cost, not sig math): report cold and warm separately.
    t0 = time.monotonic()
    rhp_signature_table(emb).write.format("noop").mode("overwrite").save()
    lsh_cold_sec = round(time.monotonic() - t0, 3)
    rhp_signature_table(emb).write.mode("overwrite").parquet(sig_dir)
    sig_df = spark.read.parquet(sig_dir)

    # ---- timed entries ----------------------------------------------------
    # Each entry is (name, thunk, rounds).  Thunks force full computation.
    summaries: dict[str, dict] = {}

    def _job(path: str, dedup: str | None, tag: str):
        def run(rep: int) -> None:
            out_dir = tempfile.mkdtemp(prefix=f"bench_{tag}_")
            kw = {"dedup": dedup} if dedup else {}
            summaries[tag] = run_extraction_job(
                spark, path, out_dir, run_id=f"{tag}{rep}", num_parts=CPUS, **kw
            )
            shutil.rmtree(out_dir, ignore_errors=True)

        return run

    def _query(name: str):
        fn = QUERY_FNS[name]

        def run(rep: int) -> None:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        return run

    def _funnel(rep: int) -> None:
        # every curation tier at once: url-canonicalization dedup (pre-text),
        # exact text dedup (pre-Arrow), post-extract PII scrub — the full
        # training-corpus funnel shape with per-tier lineage audit
        out_dir = tempfile.mkdtemp(prefix="bench_funnel_")
        summaries["funnel"] = run_extraction_job(
            spark, dup_path, out_dir, run_id=f"funnel{rep}", num_parts=CPUS,
            dedup="exact", url_dedup=True, pii_scrub=True,
        )
        shutil.rmtree(out_dir, ignore_errors=True)

    entries: list[tuple[str, object, int]] = [
        ("headline", _job(pages_path, None, "headline"), HEADLINE_ROUNDS),
        ("dedup_pipeline", _job(dup_path, "exact", "dedup"), QUERY_ROUNDS),
        ("funnel_pipeline", _funnel, QUERY_ROUNDS),
    ]
    entries += [(n, _query(n), QUERY_ROUNDS) for n in BENCH_QUERIES]
    # rebuilds go to a SIBLING dir — writing under sig_dir would put a
    # foreign subtree inside the parquet root the probe entry re-reads
    rebuild_dir = tempfile.mkdtemp(prefix="bench_sig_rebuild_")
    entries.append(
        (
            "s_lsh_sig_build_once",
            lambda rep: rhp_signature_table(emb)
            .write.mode("overwrite")
            .parquet(rebuild_dir),
            QUERY_ROUNDS,
        )
    )
    entries.append(
        (
            "s_lsh_probe_only",
            lambda rep: topk_cosine_lsh_probe(sig_df, qv, k=10)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            QUERY_ROUNDS,
        )
    )
    # semantic-dedup deployment A/B under explicit names (r4 verdict task 8):
    # the skewed k=8 case vs the balanced k~sqrt(n) case, BOTH at the
    # production-ish tau=0.9 and with the cluster guard on, so the pair is
    # isolated on the centroid-count (skew) variable alone.  (The registered
    # `s_semantic_dedup` entry above is the driver-matched query — tau=0.35
    # for a pair-dense oracle hash — and is not the A/B.)
    from ocr_sam_project_spark.operators.similarity import semantic_dedup

    n_emb = emb.count()
    k_sqrt = max(2, int(n_emb**0.5))

    def _semdedup(k: int, name: str) -> None:
        entries.append(
            (
                name,
                lambda rep: semantic_dedup(
                    emb, tau=0.9, n_centroids=k, max_cluster=64
                )
                .select("vec_id")
                .write.format("noop")
                .mode("overwrite")
                .save(),
                QUERY_ROUNDS,
            )
        )

    _semdedup(8, "s_semantic_dedup_k8")
    _semdedup(k_sqrt, "s_semantic_dedup_sqrtk")

    times: dict[str, list[float]] = {name: [] for name, _, _ in entries}

    def _run_once(name: str, thunk, rep: int) -> None:
        t0 = time.monotonic()
        thunk(rep)
        times[name].append(time.monotonic() - t0)

    # interleaved rounds: rep k of EVERY entry before rep k+1 of any, so a
    # contended window is spread across entries instead of owning one entry
    max_rounds = max(r for _, _, r in entries)
    for rnd in range(max_rounds):
        for name, thunk, rounds in entries:
            if rnd < rounds:
                _run_once(name, thunk, rnd)

    # stall detection: spread beyond 3x means some reps hit a contended
    # window — append extra reps so the median is taken over a larger,
    # mostly-clean sample
    stalled: list[str] = []
    for name, thunk, _rounds in entries:
        ts = times[name]
        if max(ts) > STALL_SPREAD * min(ts):
            stalled.append(name)
            for rep in range(EXTRA_REPS):
                _run_once(name, thunk, 100 + rep)

    med = {name: _median(ts) for name, ts in times.items()}
    spread = {
        name: [round(min(ts), 3), round(max(ts), 3)] for name, ts in times.items()
    }

    pipeline_sec = med["headline"]
    summary = summaries["headline"]
    s_dd = summaries["dedup"]
    # docs_per_sec keeps the r1-r3 metric definition: non-quarantined docs the
    # job actually extracted (summary docs_in) over the headline wall-clock;
    # pages_per_sec is the raw-input-rows variant r4 briefly reported.
    docs_per_sec = summary["docs_in"] / pipeline_sec if pipeline_sec else 0.0
    pages_per_sec = n_pages / pipeline_sec if pipeline_sec else 0.0

    qtimes = {n: round(med[n], 3) for n in BENCH_QUERIES}
    qtimes["s_lsh_sig_build_cold"] = lsh_cold_sec
    qtimes["s_lsh_sig_build_once"] = round(med["s_lsh_sig_build_once"], 3)
    qtimes["s_lsh_probe_only"] = round(med["s_lsh_probe_only"], 3)
    qtimes["s_semantic_dedup_k8"] = round(med["s_semantic_dedup_k8"], 3)
    qtimes["s_semantic_dedup_sqrtk"] = round(med["s_semantic_dedup_sqrtk"], 3)
    shutil.rmtree(sig_dir, ignore_errors=True)
    shutil.rmtree(rebuild_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "extraction_pipeline_sec",
                "value": round(pipeline_sec, 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "docs_per_sec": round(docs_per_sec, 1),
                "pages_per_sec": round(pages_per_sec, 1),
                "pages": n_pages,
                "segments_out": summary["segments_out"],
                "errors": summary["errors"],
                "dedup_exact_pipeline_sec": round(med["dedup_pipeline"], 3),
                "dedup_pages_in": s_dd["docs_in"] + s_dd["dups_dropped"],
                "dedup_dups_dropped": s_dd["dups_dropped"],
                "funnel_pipeline_sec": round(med["funnel_pipeline"], 3),
                "funnel_url_dups_dropped": summaries["funnel"]["url_dups_dropped"],
                "funnel_pii_redactions": summaries["funnel"]["pii_redactions"],
                "cpus": CPUS,
                "stat": "median",
                "reps": {"headline": len(times["headline"]), "queries": QUERY_ROUNDS},
                "spread": spread,
                "stall_reruns": stalled,
            }
        ),
        flush=True,
    )
    # COMPACT line LAST (the driver's 2000-char tail capture parses the final
    # stdout line; the full line above overflows that window by design)
    print(
        json.dumps(
            {
                "metric": "extraction_pipeline_sec",
                "value": round(pipeline_sec, 3),
                "unit": "sec",
                "docs_per_sec": round(docs_per_sec, 1),
                "pages_per_sec": round(pages_per_sec, 1),
                "pages": n_pages,
                "sf": sf,
                "cpus": CPUS,
                "stat": "median",
                "dedup_exact_pipeline_sec": round(med["dedup_pipeline"], 3),
                "funnel_pipeline_sec": round(med["funnel_pipeline"], 3),
                "s_semantic_dedup_k8_sec": round(med["s_semantic_dedup_k8"], 3),
                "s_semantic_dedup_sqrtk_sec": round(med["s_semantic_dedup_sqrtk"], 3),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
