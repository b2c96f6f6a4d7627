"""Every oracle-checkable query must match DuckDB exactly (row count +
column names + order-insensitive value hash) — the same comparison the
driver runs at sf0.01. Kept at sf0.001 here for test-suite speed; run
`python tests/oracle_harness.py /root/testdata/sf0.01` for the full sweep."""

from __future__ import annotations

from tests.oracle_harness import compare_all

SF_DIR = "/root/testdata/sf0.001"


def test_all_queries_match_oracle(spark):
    results = compare_all(spark, SF_DIR)
    failures = {
        n: r.get("detail") for n, r in results.items() if not r["ok"]
    }
    assert not failures, failures
    oracle_checked = [n for n, r in results.items() if r["mode"] == "oracle"]
    rows_only = [n for n, r in results.items() if r["mode"] == "rows-only"]
    assert len(oracle_checked) >= 20
    # only engine-hash ops are allowed to skip the oracle
    assert set(rows_only) <= {
        "minhash_signatures",
        "lsh_bucket_candidates",
        "simhash_fingerprint",
        "doc_fingerprint",
        "ann_lsh_bucketed",
        "approx_distinct",
        "embedding_neardup_pairs_fast",
    }


def test_approx_distinct_within_5pct(spark):
    from engine.queries import q_approx_distinct, _t
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.01"
    approx = q_approx_distinct(spark, sf).collect()[0]
    exact = (
        _t(spark, sf, "events")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct("event_id").alias("e"),
        )
        .collect()[0]
    )
    assert abs(approx["approx_users"] - exact["u"]) <= 0.05 * exact["u"]
    assert abs(approx["approx_events"] - exact["e"]) <= 0.05 * exact["e"]
