"""Source/sink adapters for the pages table — schema-enforced ingest.

The reference ingests denormalized JSON payloads from the dashboard
(emop/lib/emop_payload.py :: load_input [U]); here every ingest path maps
onto the ONE declared `PAGES_SCHEMA` (no inference — inference at 100 TB
means a full pre-scan and schema drift between partitions).

Formats:
  parquet  — the native layout (binary html intact)
  orc      — columnar alternative (binary intact; warehouses standardized
             on ORC ingest it natively)
  json     — html carried base64 (JSON has no binary type); decoded on read
  csv      — ditto; for small interchange/debug extracts only

Sinks mirror the formats; `write_pages` always writes parquet (columnar,
predicate-pushdown-able) — JSON/CSV exports exist for interop, marked as
non-scale paths in their docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine.schema import PAGES_SCHEMA

# JSON/CSV wire schema: html as base64 text
_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html_b64", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_COLS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_pages_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingest: columnar with a real binary type, so html round-trips
    byte-exact like parquet (predicate pushdown + column pruning apply)."""
    return spark.read.schema(PAGES_SCHEMA).orc(path)


def write_pages_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink — a scale path like parquet."""
    df.select(*_COLS).write.mode(mode).orc(path)


def read_pages_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines ingest; html arrives base64 (JSON has no binary type)."""
    raw = spark.read.schema(_WIRE_SCHEMA).json(path)
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def read_pages_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(_WIRE_SCHEMA).option("header", True).csv(path)
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def write_pages(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Native sink: parquet (the only path meant for full-scale data)."""
    df.select(*_COLS).write.mode(mode).parquet(path)


def export_pages_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Interchange export (NOT a scale path: row-oriented, base64-inflated)."""
    df.select(
        "url",
        "warc_ts",
        F.base64("html").alias("html_b64"),
        "text",
        "lang",
    ).write.mode(mode).json(path)


def export_pages_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Interchange export (NOT a scale path)."""
    df.select(
        "url",
        "warc_ts",
        # Spark's base64 is MIME-chunked (newline every 76 chars) — strip so
        # each CSV record stays on one physical line
        F.regexp_replace(F.base64("html"), "[\\r\\n]", "").alias("html_b64"),
        "text",
        "lang",
    ).write.mode(mode).option("header", True).csv(path)
