"""Custom stateful streaming operator: running per-partition lineage.

The reference tracks batch progress in DynamoDB with atomic counters and a
derived status state machine (tracking_service.py:93-147,
crm_integrator/app.py:785-807).  In Structured Streaming that becomes an
``applyInPandasWithState`` operator: per part_id, the state holds running
(docs, segments, errors) counters; each micro-batch emits the updated row
with the derived status — exactly-once via the query checkpoint.

Status rules (tracking_service.py:112-124 analog):
  errors == 0 and segments > 0 -> 'completed'
  errors > 0  and segments > errors -> 'partial_completion'
  segments == errors (all failed) -> 'error'
  else 'processing'
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("docs", LongType()),
        StructField("segments", LongType()),
        StructField("errors", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType()),
        StructField("docs", LongType()),
        StructField("segments", LongType()),
        StructField("errors", LongType()),
        StructField("status", StringType()),
    ]
)


def _derive_status(segments: int, errors: int) -> str:
    if segments == 0:
        return "queued"
    if errors == 0:
        return "completed"
    if segments > errors:
        return "partial_completion"
    return "error"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    docs, segments, errors = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        segments += len(pdf)
        # one seg_no==1 row per processed document: an exact, state-free doc
        # counter (a distinct-url count would need unbounded per-key state)
        docs += int((pdf["seg_no"] == 1).sum())
        errors += int(pdf["error"].notna().sum())
    state.update((docs, segments, errors))
    yield pd.DataFrame(
        [
            {
                "part_id": key[0],
                "docs": docs,
                "segments": segments,
                "errors": errors,
                "status": _derive_status(segments, errors),
            }
        ]
    )


def running_lineage(extractions_stream: DataFrame, num_parts: int = 32) -> DataFrame:
    """Streaming extractions -> continuously-updated per-partition lineage."""
    with_part = extractions_stream.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("url")), F.lit(num_parts)).cast("int")
    )
    return (
        with_part.select("part_id", "url", "seg_no", "error")
        .groupBy("part_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
