"""Driver-mimicking correctness gate: run every Spark query in
queries.QUERY_FNS that has an oracle and compare against DuckDB on the same
parquet tables — row count, column names, and order-insensitive values
(exactly what CORRECTNESS_r{N}.json checks)."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pytest

from ocr_sam_project_spark.queries import ORACLES, QUERY_FNS, TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries pre-round; this only normalizes representation
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_norm(r[i])) for i in idx) for r in rows
    ), [cols[i] for i in idx]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERY_FNS[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    sset, _ = _rows_to_multiset(scols, [[r[c] for c in scols] for r in srows])
    dset, _ = _rows_to_multiset(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_no_hugeint_oracle_columns(duck):
    """Guard against the DuckDB integer-sum widening class of driver
    hash-fails (r1 `a2`, r3 `t_curate_corpus`): DuckDB widens SUM(BIGINT)
    to HUGEINT (int128), which Spark cannot produce, so the driver's typed
    value-hash diverges even when every value matches. Every oracle must
    CAST such sums back to BIGINT."""
    offenders = {}
    for name, sql in sorted(ORACLES.items()):
        types = [str(t).upper() for t in duck.sql(sql).types]
        bad = [t for t in types if "HUGEINT" in t or "INT128" in t]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles with HUGEINT/INT128 output columns: {offenders}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERY_FNS) - set(ORACLES)):
        df = QUERY_FNS[name](spark, SF_DIR)
        assert df.count() >= 0, name
