"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For every left row, attach the most recent right row with
right.time <= left.time within the same key.  Implemented as the standard
union + running-``last(ignorenulls)`` window trick:

  1. tag both sides, union them on (key, time, payload-cols),
  2. window per key ordered by (time, side) with right rows sorting FIRST on
     time ties (so an equal-time right row IS visible to the left row —
     DuckDB/kdb ASOF `>=` semantics),
  3. running last(payload-struct, ignorenulls=True) carries the latest right
     ROW forward as one struct (so a matched row's NULL payload stays NULL
     and multi-column payloads never mix rows); filter back to left rows.

Scale: one shuffle on the key (same as any sort-merge join), no skew blowup
beyond the key distribution — salt keys upstream if Zipfian.  The oracle
twin is DuckDB's native ``ASOF LEFT JOIN`` (queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """left ASOF LEFT JOIN right ON left.by = right.by AND left.on >= right.on.

    Returns every left row plus `<value_col><suffix>` columns holding the
    payload of the latest right row at-or-before the left row's time
    (nulls when no prior right row exists).

    The right side must be unique per (by, on) — pre-aggregate if not.
    """
    lcols = left.columns
    tagged_l = left.withColumn("_side", F.lit(1))
    # carry ONE struct per right row (not per-column last(ignorenulls)):
    # a matched right row whose payload is genuinely NULL must be returned
    # as NULL, not skipped over in favor of a stale older value — and with
    # multiple value_cols all carried values must come from the SAME row.
    tagged_r = right.select(
        by,
        on,
        F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
    ).withColumn("_side", F.lit(0))
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # right rows (side 0) sort before left rows (side 1) on time ties ->
    # equal-time right payloads are visible (ASOF >= semantics)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*", F.last(F.col("_payload"), ignorenulls=True).over(w).alias("_carry")
    )
    out = carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_carry.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
