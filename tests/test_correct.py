"""PageCorrector-analog tests: the JVM CASE-chain path and the
broadcast-dictionary Arrow path must produce byte-identical corrected
text, the stats must be non-vacuous on the testdata vocabulary, and the
Arrow stage must stay map-only (no shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.correct import (
    DEFAULT_DICT,
    correct_with_broadcast_dict,
    corrected_tokens_expr,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_jvm_and_arrow_paths_identical(spark):
    d = _docs(spark)
    jvm = d.select(
        "doc_id",
        F.concat_ws(
            " ", corrected_tokens_expr(F.split("text", " "), DEFAULT_DICT)
        ).alias("corrected"),
    )
    arrow = correct_with_broadcast_dict(d, "text", DEFAULT_DICT).select(
        "doc_id", "corrected"
    )
    a = {r["doc_id"]: r["corrected"] for r in jvm.collect()}
    b = {r["doc_id"]: r["corrected"] for r in arrow.collect()}
    assert a == b and len(a) > 0


def test_corrections_non_vacuous(spark):
    """The demo dictionary must actually fire on the corpus (dict keys are
    drawn from the testdata vocabulary) — otherwise the oracle row proves
    nothing."""
    out = correct_with_broadcast_dict(_docs(spark), "text", DEFAULT_DICT)
    agg = out.agg(
        F.sum("n_corr").alias("c"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert agg["c"] > 0
    assert agg["c"] < agg["t"]  # and it doesn't rewrite everything


def test_arrow_correction_is_map_only(spark):
    """The 100 TB shape: one MapInPandas over the scan, zero Exchange."""
    plan = (
        correct_with_broadcast_dict(_docs(spark), "text", DEFAULT_DICT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
