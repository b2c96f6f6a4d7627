"""Boilerplate-classification quality eval against synthetic ground truth.

synth knows exactly which words are article text vs chrome per template, so
the extractor's word-level precision/recall is measurable directly — the
quantitative counterpart of the byte-identity goldens (which pin
determinism, not semantics). Thresholds are deliberately below the observed
values to catch regressions, not noise.
"""

from __future__ import annotations

from collections import Counter

from engine.extract.core import extract_document
from engine.synth import gen_doc_with_expected

N_DOCS = 800


def _bag(text: str) -> Counter:
    return Counter(text.split())


def test_word_level_precision_recall():
    per_doc = []
    n_eval = 0
    for i in range(N_DOCS):
        rows, expected = gen_doc_with_expected(i)
        if expected is None:
            continue
        rec = extract_document(rows[0]["html"])
        assert rec["status"] == "ok"
        got = _bag(rec["text"])
        want = _bag(expected)
        if not want:  # link farm: perfect = extract nothing
            assert sum(got.values()) == 0
            continue
        n_eval += 1
        inter = sum((got & want).values())
        p = inter / max(sum(got.values()), 1)
        r = inter / sum(want.values())
        per_doc.append((p, r))
    assert n_eval >= 500
    avg_p = sum(p for p, _ in per_doc) / len(per_doc)
    avg_r = sum(r for _, r in per_doc) / len(per_doc)
    # observed on this corpus: P≈0.99+, R≈0.97+; thresholds guard regressions
    assert avg_p >= 0.95, avg_p
    assert avg_r >= 0.90, avg_r
    # no evaluable doc may be catastrophically wrong
    worst_r = min(r for _, r in per_doc)
    assert worst_r >= 0.3, worst_r
