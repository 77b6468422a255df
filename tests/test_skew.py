"""Skew handling: url-hash salting must spread Zipfian domains uniformly
(SURVEY.md §4 item 1 — the explicit skew strategy the north_rule requires)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_sam_project_spark.pipeline.job import with_part_id


def test_domains_are_zipfian_but_parts_are_uniform(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    n = pages.count()

    # the raw domain distribution IS skewed (generator plants hot domains) —
    # partitioning by domain would melt one executor
    dom = pages.withColumn("domain", F.regexp_extract("url", r"https://([^/]+)/", 1))
    top_share = (
        dom.groupBy("domain").count().orderBy(F.col("count").desc()).first()["count"] / n
    )
    assert top_share > 0.15, f"generator should produce hot domains, top={top_share}"

    # url-hash salting spreads those same rows uniformly across part_ids
    parts = with_part_id(pages, 8).groupBy("part_id").count().collect()
    counts = [r["count"] for r in parts]
    assert len(counts) == 8
    mean = n / 8
    assert max(counts) / mean < 1.4, f"salted partitions skewed: {sorted(counts)}"
    assert min(counts) / mean > 0.6, f"salted partitions skewed: {sorted(counts)}"


def test_hot_domain_rows_spread_across_all_parts(spark, pages_parquet):
    pages = with_part_id(spark.read.parquet(pages_parquet), 8)
    hot = pages.filter(F.col("url").contains("organojudicial.gob.pa"))
    n_parts_hit = hot.select("part_id").distinct().count()
    assert n_parts_hit == 8, "hot domain must land on every partition"


def test_salted_join_equals_plain_join(spark):
    from ocr_sam_project_spark.operators.skew import salted_join

    # skewed big side: 90% of rows share one key
    big = spark.range(2000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 1 ELSE CAST(id % 50 AS BIGINT) END AS k"
    )
    small = spark.range(50).selectExpr("id AS k", "concat('dim_', id) AS dim")
    plain = big.join(small, "k").select("id", "k", "dim")
    salted = salted_join(big, small, "k").select("id", "k", "dim")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    from ocr_sam_project_spark.operators.skew import salted_join
    from pyspark.sql import functions as F

    big = spark.range(2000).selectExpr("id", "CAST(1 AS BIGINT) AS k")  # all-hot
    small = spark.range(5).selectExpr("id AS k", "'d' AS dim")
    out = salted_join(big, small, "k", salt_buckets=8)
    # the hot key's rows carry 8 distinct salts pre-join (spread over 8
    # reducers); verify via the salted big side directly
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int")
    )
    assert salted_big.select("_salt").distinct().count() == 8
    assert out.count() == 2000  # k=1 matches the one dim row


def test_salted_join_rejects_outer_variants(spark):
    import pytest as _pytest

    from ocr_sam_project_spark.operators.skew import salted_join

    df = spark.range(4).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError, match="inner"):
        salted_join(df, df, key="k", how="right")
    with _pytest.raises(ValueError, match="inner"):
        salted_join(df, df, key="k", how="full")


def test_span_dedup_survives_hot_gram_corpus(spark):
    """Adversarial skew for ExactSubstr: a corpus where ONE n-gram repeats
    everywhere ("the the the ...") lands every occurrence of that gram in a
    single fingerprint partition.  The rows there are (fp, id, pos) only —
    never text — and the window computes a single min, so the operator must
    complete and produce the exact keep-first semantics: the lexicographically
    first (id, pos) window survives, every later token covered by a
    duplicated window is removed."""
    from ocr_sam_project_spark.operators.curation import span_dedup

    n_docs, reps = 60, 40
    df = spark.createDataFrame(
        [(i, " ".join(["the"] * reps)) for i in range(n_docs)],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in span_dedup(df, n=5).collect()}
    # doc 0 keeps ONLY position 1: the window starting at 2 is already a
    # duplicate of the window starting at 1 (self-overlap), so duplicated
    # starts {2..36} cover positions 2..40; every other doc is wiped
    assert out[0].text == "the" and out[0].n_removed == reps - 1
    for i in range(1, n_docs):
        assert out[i].text == "" and out[i].n_removed == reps
