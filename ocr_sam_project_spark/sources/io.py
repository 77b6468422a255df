"""Parquet IO for the synthetic pages table (pyarrow — no Spark needed at
generation time; generation happens driver-side once, pipelines read parquet).

At real scale this table is an Iceberg table partitioned by days(warc_ts) /
bucket(url); this sandbox has no Iceberg runtime jar, so plain parquet stands
in — the pipeline only relies on (a) columnar scan with pruning and (b)
partition-granular overwrite, both of which parquet provides.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .synth import golden_rows, pages_rows

PAGES_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

GOLDEN_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("seg_no", pa.int32(), nullable=False),
        pa.field("extracted_text", pa.string(), nullable=False),
    ]
)


def write_pages_parquet(path: str, n: int, seed: int = 42, row_group_size: int = 256) -> str:
    # small row groups: Spark can't split a file below row-group granularity,
    # and the scaling bench needs >= cores splits from one file.
    """Generate n synthetic pages and write one parquet file at `path`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rows = pages_rows(n, seed)
    table = pa.Table.from_pylist(rows, schema=PAGES_ARROW_SCHEMA)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def write_golden_parquet(path: str, n: int, seed: int = 42) -> str:
    """Golden (url, seg_no, extracted_text) rows for the same generation."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rows = golden_rows(n, seed)
    table = pa.Table.from_pylist(rows, schema=GOLDEN_ARROW_SCHEMA)
    pq.write_table(table, path)
    return path
