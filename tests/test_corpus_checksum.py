"""Corpus-level determinism pin: an aggregate checksum over the first 2000
synthetic docs' extraction output, frozen at extractor_version 1.0.0.

The 11 golden files cover one doc per fixture class; this pins the WHOLE
distribution (all template variants, all langs, all failure modes, re-crawl
dups). Any change to engine/synth.py or engine/extract/core.py output —
however subtle — flips this hash. If the change is deliberate, regenerate
(command in the assert message), hand-audit a sample diff, bump
EXTRACTOR_VERSION, and update both constants here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.extract.udf import run_extract
from engine.synth import generate_pages

FROZEN_SHA = "161733f9d26f0c828d6f5ca39e9d1375576499ebc003a47e703df6b2c102b23e"
FROZEN_ROWS = 2043
N_DOCS = 2000


def test_corpus_extraction_checksum_frozen(spark):
    out = run_extract(generate_pages(spark, N_DOCS, partitions=8))
    row = (
        out.select(
            F.concat_ws(
                ":",
                "url",
                F.sha2(
                    F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"), 256
                ),
                F.coalesce(F.col("status"), F.lit("")),
                F.coalesce(F.col("error"), F.lit("")),
            ).alias("line")
        )
        .agg(
            F.sha2(
                F.concat_ws("\n", F.sort_array(F.collect_list("line"))), 256
            ).alias("h"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    assert row["n"] == FROZEN_ROWS
    assert row["h"] == FROZEN_SHA, (
        "corpus extraction output changed — if deliberate, recompute via the "
        "snippet in this test, hand-audit, bump EXTRACTOR_VERSION, update "
        "FROZEN_SHA/FROZEN_ROWS"
    )
