"""Vectorized Spark wrappers over the pure-Python extractor core.

BASELINE.json input_hint demands "vectorized pandas/Arrow UDFs (no per-row
Python) throughout": html BINARY crosses the JVM→Python Arrow channel exactly
once per batch, the whole R1–R5 stage chain of the reference
(tesseract→xml_to_text→denoise→multi_column_skew→page_evaluator [U]) runs as
ONE fused function over the batch (SURVEY.md §3.3 dedup note), and the
(text, spans, metrics) result crosses back once.

`mapInArrow` is the default surface (SURVEY §3.3's target): the measured A/B
on the 150k-doc bench corpus (interleaved min-of-3 at local[32]) put the
arrow body at 34.4k docs/s vs 30.7k for the mapInPandas twin (+12%) — the
win is skipping the Arrow→pandas→Arrow hop on both sides of the channel;
both paths still materialize Python bytes for the tokenizer. The pandas
body is kept as `run_extract_pandas` (same output, byte-identical — pinned
in tests/test_spark_extract.py) because a scalar-iterator pandas surface is
what most Spark shops reach for first, and the twin documents exactly what
the swap buys. Neither uses a scalar pandas_udf: the output is a 10-column
struct-per-row (spans is array<struct>) — one pass, one schema, no column
reassembly on the JVM side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from engine.extract.core import extract_document
from engine.schema import EXTRACTED_DDL

_OUT_COLS = [
    "url",
    "text",
    "spans",
    "n_chars",
    "link_density",
    "boiler_ratio",
    "quality",
    "extractor_version",
    "status",
    "error",
]


def extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (url, html, ...) batches → extracted batches."""
    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        # column-wise assembly (dict-of-lists) — cheaper pandas/Arrow
        # conversion than a list of per-row dicts
        cols: dict[str, list] = {c: [] for c in _OUT_COLS}
        cols["url"] = urls
        for html in htmls:
            rec = extract_document(html)
            for c in _OUT_COLS[1:]:
                cols[c].append(rec[c])
        yield pd.DataFrame(cols, columns=_OUT_COLS)


def run_extract_pandas(pages_df):
    """mapInPandas variant — the measured -12% twin of run_extract (see
    module doc); byte-identical output, kept as the documented alternative
    surface."""
    return pages_df.select("url", "html").mapInPandas(
        extract_batches, schema=EXTRACTED_DDL
    )


def extract_batches_arrow(batches):
    """mapInArrow body — the pandas-free twin of extract_batches. Skips the
    Arrow→pandas→Arrow conversion: html bytes come out of the RecordBatch
    via to_pylist() (both paths must materialize Python bytes for the
    tokenizer), and the output batch is assembled straight into pyarrow
    arrays against the declared schema. Byte-identical to the pandas path
    by construction (same extract_document), pinned in
    tests/test_spark_extract.py."""
    import pyarrow as pa

    from engine.schema import extracted_arrow_schema

    out_schema = extracted_arrow_schema()
    for batch in batches:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        cols: dict[str, list] = {c: [] for c in _OUT_COLS}
        cols["url"] = urls
        for html in htmls:
            rec = extract_document(html)
            for c in _OUT_COLS[1:]:
                cols[c].append(rec[c])
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[c], type=out_schema.field(c).type) for c in _OUT_COLS],
            schema=out_schema,
        )


def extract_batches_arrow_with_pid(batches):
    """mapInArrow body with partition_id passthrough — the job-path twin of
    extract_batches_arrow (wave-committed runs carry partition_id through
    the channel for partitioned writes + lineage). Same extract_document,
    same +12% arrow surface as run_extract."""
    import pyarrow as pa

    for batch in batches:
        pid = batch.column("partition_id")
        for out in extract_batches_arrow(iter([batch])):
            yield pa.RecordBatch.from_arrays(
                [out.column(i) for i in range(out.num_columns)] + [pid],
                names=list(out.schema.names) + ["partition_id"],
            )


def run_extract(pages_df):
    """pages → extracted, via mapInArrow (the measured-faster surface; see
    module doc). Column-prunes to (url, html) before the UDF so only the
    needed bytes cross the Arrow channel."""
    return pages_df.select("url", "html").mapInArrow(
        extract_batches_arrow, schema=EXTRACTED_DDL
    )


def dedup_latest_crawl(pages_df, canonical: bool = False):
    """One row per url: keep the latest warc_ts (re-crawl wins). The per-url
    byte-identical invariant (BASELINE.json:14) is defined over THIS view —
    a url extracted twice from two crawls is one logical document.
    One shuffle on the dedup key, scale-safe.

    `canonical=True` keys the dedup on engine.sources.canonical_url
    instead of the raw string, so trivially-different spellings of one
    resource (case, default port, fragment, utm tracking params) collapse
    to one logical document; the surviving row keeps its ORIGINAL url.
    Ties on warc_ts within a canonical group break on url for a
    deterministic winner. Off by default: raw-key dedup is the frozen
    goldens' behavior and canonicalization is the ingest owner's call."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    if canonical:
        from engine.sources import canonical_url

        key = canonical_url("url")
        w = W.partitionBy(key).orderBy(F.desc("warc_ts"), F.asc("url"))
    else:
        w = W.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
