"""Physical-plan regression tests — the scale properties the engine claims
(SURVEY.md §5.2, BENCH/BASELINE.md) must stay visible in the plans:
column pruning into the Arrow channel, pushed filters, broadcast joins,
top-k without a global sort, map-only extraction (no exchange)."""

from __future__ import annotations

import pytest

from engine.extract.udf import run_extract
from engine.queries import (
    q_broadcast_dim_join,
    q_pricing_summary,
    q_topk_hot_keys,
)
from engine.synth import generate_pages

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages.parquet")
    generate_pages(spark, 100, partitions=2).write.parquet(p)
    return p


def test_extract_scan_prunes_to_url_html(spark, pages_path):
    plan = _plan(run_extract(spark.read.parquet(pages_path)))
    assert "ReadSchema: struct<url:string,html:binary>" in plan
    assert "MapInPandas" in plan
    # map-only: no shuffle/exchange anywhere in the extract stage
    assert "Exchange" not in plan


def test_dim_joins_broadcast_with_pushdown(spark):
    plan = _plan(q_broadcast_dim_join(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "p_size" in plan and "PushedFilters" in plan


def test_pricing_scan_pushes_date_filter(spark):
    plan = _plan(q_pricing_summary(spark, SF))
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # column pruning: unused cols never reach the scan
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in read and "l_partkey" not in read


def test_topk_avoids_global_sort(spark):
    plan = _plan(q_topk_hot_keys(spark, SF))
    assert "TakeOrderedAndProject" in plan
