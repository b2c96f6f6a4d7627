"""Declared StructTypes for every table in the pipeline.

The reference (Early-Modern-OCR/emop-controller) is schemaless JSON-over-HTTP
(emop/lib/emop_payload.py, emop/lib/models/*.py); here every table has one
fixed, declared schema so Catalyst can prune/push down and the Arrow channel
has a stable layout.

Tables
------
pages      : the input (BASELINE.json input_hint — exact shape, do not change)
extracted  : per-url extraction output (FIXTURES.md §2)
lineage    : per-partition per-stage commit rows (FIXTURES.md §3)
manifest   : run/partition status lifecycle (FIXTURES.md §3), mirrors the
             reference's job_queues status machine
             not_started → reserved → processing → done/failed
             (emop/lib/emop_query.py, emop/lib/emop_job.py [U]).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Nullability is uniformly True: this schema is produced by a Python UDF
# (mapInPandas), whose DDL-declared output is always nullable on the JVM side.
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("node_path", T.StringType(), True),
        T.StructField("start", T.IntegerType(), True),
        T.StructField("end", T.IntegerType(), True),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("link_density", T.DoubleType(), True),
        T.StructField("boiler_ratio", T.DoubleType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("extractor_version", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# extracted + the partition id the row was committed under (resume unit).
EXTRACTED_PARTITIONED_SCHEMA = T.StructType(
    EXTRACTED_SCHEMA.fields + [T.StructField("partition_id", T.IntegerType(), False)]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("byte_count", T.LongType(), False),
        T.StructField("extractor_version", T.StringType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

# DDL strings for mapInPandas(schema=...) call sites.
EXTRACTED_DDL = (
    "url string, text string, "
    "spans array<struct<node_path:string,start:int,end:int>>, "
    "n_chars long, link_density double, boiler_ratio double, quality double, "
    "extractor_version string, status string, error string"
)


def extracted_arrow_schema():
    """pyarrow schema matching EXTRACTED_SCHEMA — for the mapInArrow
    extract variant (assembling RecordBatches without a pandas hop)."""
    import pyarrow as pa

    span = pa.struct(
        [
            pa.field("node_path", pa.string()),
            pa.field("start", pa.int32()),
            pa.field("end", pa.int32()),
        ]
    )
    return pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("text", pa.string()),
            pa.field("spans", pa.list_(span)),
            pa.field("n_chars", pa.int64()),
            pa.field("link_density", pa.float64()),
            pa.field("boiler_ratio", pa.float64()),
            pa.field("quality", pa.float64()),
            pa.field("extractor_version", pa.string()),
            pa.field("status", pa.string()),
            pa.field("error", pa.string()),
        ]
    )
