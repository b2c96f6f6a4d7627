"""Generate (once) and load the frozen golden corpus.

Goldens pin the byte-identical invariant (BASELINE.json:2): since the
reference binaries are unavailable in-sandbox (SURVEY.md §0), goldens were
generated ONCE by engine/extract/core.py at EXTRACTOR_VERSION 1.0.0,
hand-audited (see test_golden.py docstring), and frozen into
tests/fixtures/golden/. Re-frozen at 1.1.0 (malformed-anchor fix): all 11
texts byte-identical to 1.0.0, only the manifest version changed. `python tests/golden_tool.py regen` is the only
sanctioned way to re-freeze, and any diff it produces must be reviewed as a
semantic change to the extractor.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures" / "golden"

# doc index in the seed-42 synthetic corpus per fixture class (FIXTURES.md §1)
FIXTURE_DOCS = {
    "boilerplate_heavy_zh": 0,
    "boilerplate_heavy_de": 1,
    "plain_minimal": 2,
    "pdf_text": 3,
    "boilerplate_heavy_en": 4,
    "link_farm": 5,
    "boilerplate_heavy_fr": 23,
    "tables_lists": 33,
    "empty_junk": 51,
    "boilerplate_heavy_ar": 59,
    "malformed": 66,
}


def regen() -> None:
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from engine.extract.core import EXTRACTOR_VERSION, extract_document
    from engine.synth import gen_doc

    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    manifest = {"extractor_version": EXTRACTOR_VERSION, "docs": {}}
    for name, idx in sorted(FIXTURE_DOCS.items()):
        row = gen_doc(idx)[0]
        rec = extract_document(row["html"])
        entry = {
            "doc_index": idx,
            "url": row["url"],
            "lang": row["lang"],
            "status": rec["status"],
            "error": rec["error"],
            "n_spans": len(rec["spans"] or []),
        }
        if rec["text"] is not None:
            (FIXTURE_DIR / f"{name}.txt").write_bytes(rec["text"].encode("utf-8"))
            entry["sha256"] = hashlib.sha256(
                rec["text"].encode("utf-8")
            ).hexdigest()
        manifest["docs"][name] = entry
    (FIXTURE_DIR / "manifest.json").write_text(
        json.dumps(manifest, indent=2, sort_keys=True) + "\n"
    )
    print(f"froze {len(FIXTURE_DOCS)} goldens → {FIXTURE_DIR}")


def load_manifest() -> dict:
    return json.loads((FIXTURE_DIR / "manifest.json").read_text())


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
    else:
        print(__doc__)
