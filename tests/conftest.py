"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("engine-tests")
        # keep catalog-managed tables (tests/test_catalog.py) out of the
        # repo tree — spark.sql.warehouse.dir is static, set-at-start-only;
        # pytest's tmp factory garbage-collects old sessions' dirs
        .config(
            "spark.sql.warehouse.dir",
            str(tmp_path_factory.mktemp("spark-wh")),
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
