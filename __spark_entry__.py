"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full main-content extraction pipeline end-to-end.

    Synthesizes the deterministic tiny `pages(url, warc_ts, html, text, lang)`
    corpus (BASELINE.json input_hint — built in-repo, no external data) and
    runs the fused DOM-tokenize → boilerplate-classify → readability-tiebreak
    extract stage as one vectorized mapInArrow pass, returning the
    `extracted` DataFrame (url, text, spans, metrics, status).
    """
    from engine.extract.udf import dedup_latest_crawl, run_extract
    from engine.synth import generate_pages

    pages = generate_pages(spark, 1000, partitions=8)
    return run_extract(dedup_latest_crawl(pages))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (§3.3 checklist
    + training-data pipeline ops). See engine/queries.py for the registry;
    engine-hash-based ops (minhash/simhash/fingerprint/LSH) carry no oracle
    and are pinned by tests/test_dedup.py instead."""
    from engine.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per oracle-checkable query; column names
    and value determinism conventions documented in engine/queries.py."""
    from engine.queries import oracle_sql as _o

    return _o()
