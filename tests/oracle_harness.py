"""Local replica of the driver's DuckDB-oracle comparison.

Runs every `queries()` entry and its `oracle_sql()` twin at a given sf dir,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by their stringified tuple — the same
normalization the driver describes). Used by tests/test_queries_oracle.py
and runnable standalone:  python tests/oracle_harness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def _normalize_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_normalize_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm_rows = sorted(
        "|".join(_normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(norm_rows).encode()).hexdigest()
    return len(rows), ",".join(sorted(cols)), h


def compare_all(spark, sf_dir: str, only: list[str] | None = None) -> dict:
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        s_n, s_cols, s_hash = frame_fingerprint(scols, srows)
        rec = {"rows": s_n, "cols": s_cols}
        sql = oracles.get(name)
        if sql is None:
            rec["mode"] = "rows-only"
            rec["ok"] = s_n >= 0
        else:
            cur = con.execute(sql)
            dcols = [c[0] for c in cur.description]
            drows = [tuple(r) for r in cur.fetchall()]
            d_n, d_cols, d_hash = frame_fingerprint(dcols, drows)
            rec["mode"] = "oracle"
            rec["ok"] = (s_n == d_n) and (s_cols == d_cols) and (s_hash == d_hash)
            if not rec["ok"]:
                rec["detail"] = {
                    "spark": (s_n, s_cols, s_hash[:12]),
                    "duckdb": (d_n, d_cols, d_hash[:12]),
                }
        results[name] = rec
    return results


if __name__ == "__main__":
    import sys

    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = compare_all(spark, sf_dir, only=sys.argv[2:] or None)
    bad = 0
    for name, rec in res.items():
        flag = "OK " if rec["ok"] else "FAIL"
        bad += 0 if rec["ok"] else 1
        print(f"{flag} {name:24s} {rec['mode']:9s} rows={rec['rows']}")
        if not rec["ok"]:
            print("     ", rec.get("detail"))
    print(f"{len(res) - bad}/{len(res)} ok")
    sys.exit(1 if bad else 0)
