"""LSH-bucketed ANN vs the brute-force baseline: computed sims must be
exact for returned ids; bucketing must actually prune; recall is reported
(loose bound — 4-bit codes at 500 vectors are a smoke-scale codebook)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.queries import (
    q_ann_cosine_topk,
    q_ann_lsh_bucketed,
    q_embedding_neardup_pairs,
    q_embedding_neardup_pairs_fast,
)

SF = "/root/testdata/sf0.001"


def test_lsh_ann_sims_exact_and_pruned(spark):
    brute = {r["vec_id"]: r["sim"] for r in q_ann_cosine_topk(spark, SF).collect()}
    lsh_rows = q_ann_lsh_bucketed(spark, SF).collect()
    assert 0 < len(lsh_rows) <= 10
    # any id the LSH path returns must carry the same cosine the brute-force
    # kernel computes (same arithmetic, same rounding)
    for r in lsh_rows:
        if r["vec_id"] in brute:
            assert abs(r["sim"] - brute[r["vec_id"]]) < 1e-9
    # recall vs brute-force top-10 (multi-probe Hamming<=1 of a 4-bit code
    # covers 5/16 of the space; exact-dup neighbours always share the code)
    recall = len({r["vec_id"] for r in lsh_rows} & set(brute)) / len(brute)
    assert recall >= 0.2


def test_fast_neardup_same_pair_set_as_exact(spark):
    exact = {(r["vec_a"], r["vec_b"]) for r in q_embedding_neardup_pairs(spark, SF).collect()}
    fast = {(r["vec_a"], r["vec_b"]) for r in q_embedding_neardup_pairs_fast(spark, SF).collect()}
    assert fast == exact and len(exact) > 0
