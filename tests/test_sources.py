"""Source/sink round-trips: pages survive parquet/json/csv byte-exactly
(html binary through base64 wire formats) and feed the extractor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.extract.udf import run_extract
from engine.sources import (
    export_pages_csv,
    export_pages_json,
    read_pages_csv,
    read_pages_json,
    read_pages_orc,
    read_pages_parquet,
    write_pages,
    write_pages_orc,
)
from engine.synth import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 120, partitions=2).cache()


def _fingerprint(df):
    return {
        (r["url"], r["sha"], r["n"])
        for r in df.select(
            "url",
            F.sha2(F.coalesce(F.col("html"), F.lit(b"")), 256).alias("sha"),
            F.coalesce(F.length("html"), F.lit(0)).alias("n"),
        ).collect()
    }


def test_parquet_roundtrip(spark, pages, tmp_path):
    p = str(tmp_path / "pq")
    write_pages(pages, p)
    back = read_pages_parquet(spark, p)
    assert _fingerprint(back) == _fingerprint(pages)


def test_orc_roundtrip_binary_exact(spark, pages, tmp_path):
    p = str(tmp_path / "orc")
    write_pages_orc(pages, p)
    back = read_pages_orc(spark, p)
    assert _fingerprint(back) == _fingerprint(pages)


def test_json_roundtrip_binary_exact(spark, pages, tmp_path):
    p = str(tmp_path / "js")
    export_pages_json(pages, p)
    back = read_pages_json(spark, p)
    assert _fingerprint(back) == _fingerprint(pages)
    # and the re-ingested table extracts identically
    a = run_extract(pages).select("url", "n_chars", "status")
    b = run_extract(back).select("url", "n_chars", "status")
    assert a.exceptAll(b).count() == 0


def test_csv_roundtrip_binary_exact(spark, pages, tmp_path):
    p = str(tmp_path / "cs")
    export_pages_csv(pages, p)
    back = read_pages_csv(spark, p)
    assert _fingerprint(back) == _fingerprint(pages)
