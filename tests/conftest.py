"""Shared test fixtures: one local SparkSession per test session, plus a
synthetic pages parquet (seed=42) in a tmp dir."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[*]")
        .appName("ocr-sam-project-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory) -> str:
    from ocr_sam_project_spark.sources.io import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(path, n=400, seed=42)
    return path


@pytest.fixture(scope="session")
def golden_parquet(tmp_path_factory) -> str:
    from ocr_sam_project_spark.sources.io import write_golden_parquet

    path = str(tmp_path_factory.mktemp("golden") / "golden.parquet")
    write_golden_parquet(path, n=400, seed=42)
    return path
