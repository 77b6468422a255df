"""Unit semantics for the as-of join: ties, no-prior-row nulls, per-key
isolation, and staleness (latest wins)."""

from __future__ import annotations

from datetime import datetime

from ocr_sam_project_spark.operators.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),   # after r@5 -> 50.0
            (2, "u1", _ts(20)),   # after r@5 and r@20 (tie) -> 200.0
            (3, "u1", _ts(3)),    # before any right row -> null
            (4, "u2", _ts(30)),   # u2 has its own timeline -> 999.0
            (5, "u3", _ts(30)),   # key with no right rows at all -> null
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 50.0),
            ("u1", _ts(20), 200.0),   # equal-time row IS visible (>= semantics)
            ("u1", _ts(25), 250.0),   # later than every left row -> never used
            ("u2", _ts(1), 999.0),
        ],
        "user_id string, ts timestamp, v double",
    )
    out = {
        r.event_id: r.v_asof
        for r in asof_join(left, right, on="ts", by="user_id", value_cols=["v"]).collect()
    }
    assert out == {1: 50.0, 2: 200.0, 3: None, 4: 999.0, 5: None}


def test_asof_null_payload_in_matched_row_stays_null(spark):
    """A matched right row whose payload is genuinely NULL must be returned
    as NULL — not skipped in favor of a stale older value (ADVICE r1)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(30))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), 50.0), ("u1", _ts(20), None)],
        "user_id string, ts timestamp, v double",
    )
    out = {
        r.event_id: r.v_asof
        for r in asof_join(left, right, on="ts", by="user_id", value_cols=["v"]).collect()
    }
    # event 2's as-of row is r@20 whose v IS NULL -> NULL, not 50.0
    assert out == {1: 50.0, 2: None}


def test_asof_multi_value_cols_come_from_same_row(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(30))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), 50.0, "old"), ("u1", _ts(20), None, "new")],
        "user_id string, ts timestamp, v double, tag string",
    )
    row = asof_join(
        left, right, on="ts", by="user_id", value_cols=["v", "tag"]
    ).collect()[0]
    # both payload columns from r@20 (the matched row): v NULL, tag 'new' —
    # never a mix of rows (v=50.0 from r@5 with tag='new' from r@20).
    assert row.v_asof is None and row.tag_asof == "new"
