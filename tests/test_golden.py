"""Golden byte-identity tests (BASELINE.json:2 — match rate must be 100%).

Goldens were frozen once at extractor_version 1.0.0 and hand-audited:
boilerplate_heavy_* contain only article text (no nav/cookie/footer strings),
link_farm is the empty string (sha256 e3b0c4…, the empty-input digest),
pdf_text is the geometric-reading-order reassembly, empty_junk is a failed
row. This file is the analog of the reference's ground-truth comparison
stages (emop/lib/processes/juxta_compare.py, retas_compare.py [U]) recast as
a hard pass/fail gate.
"""

from __future__ import annotations

import hashlib

from engine.extract.core import EXTRACTOR_VERSION, extract_document
from engine.synth import gen_doc
from tests.golden_tool import FIXTURE_DIR, load_manifest


def test_extractor_version_matches_frozen():
    assert load_manifest()["extractor_version"] == EXTRACTOR_VERSION


def test_golden_byte_identity_match_rate_100():
    manifest = load_manifest()
    matches, total = 0, 0
    failures = []
    for name, entry in sorted(manifest["docs"].items()):
        row = gen_doc(entry["doc_index"])[0]
        assert row["url"] == entry["url"], name
        rec = extract_document(row["html"])
        total += 1
        if rec["status"] != entry["status"] or (rec["error"] or None) != (
            entry.get("error") or None
        ):
            failures.append((name, "status", rec["status"], rec["error"]))
            continue
        if "sha256" in entry:
            got = hashlib.sha256(rec["text"].encode("utf-8")).hexdigest()
            if got != entry["sha256"]:
                failures.append((name, "sha", got, entry["sha256"]))
                continue
            frozen = (FIXTURE_DIR / f"{name}.txt").read_bytes()
            if rec["text"].encode("utf-8") != frozen:
                failures.append((name, "bytes", len(rec["text"]), len(frozen)))
                continue
        if len(rec["spans"] or []) != entry["n_spans"]:
            failures.append((name, "spans", len(rec["spans"] or []), entry["n_spans"]))
            continue
        matches += 1
    assert not failures, failures
    assert matches == total == len(manifest["docs"])
