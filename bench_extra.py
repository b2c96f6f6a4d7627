"""Per-query isolation bench — guide §1.4/§1.5 tooling for optimization
rounds. NOT part of the frozen driver contract (bench.py is); this file
exists so individual queries can be timed with the noop sink and their
.explain("formatted") captured without re-running the whole battery.

Usage:
    python bench_extra.py q1 q2 ...            # time named queries
    python bench_extra.py --plans plans/r06 --suffix before q1 ...
    python bench_extra.py --reps 5 q1
    python bench_extra.py --all                # whole bench.py HEADLINE set

Session config mirrors bench.py's _session(CPUS) exactly, so numbers here
are comparable to the frozen bench's per-query seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))

import bench as _bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain() files")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--sf-dir", default=_bench.SF_DIR)
    args = ap.parse_args()

    from engine.queries import queries as reg

    qs = reg()
    names = _bench.HEADLINE if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = _bench._session(_bench.CPUS, "bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    try:
        if args.plans:
            plans_dir = pathlib.Path(args.plans)
            plans_dir.mkdir(parents=True, exist_ok=True)
            for name in names:
                df = qs[name](spark, args.sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                (plans_dir / f"{name}_{args.suffix}.txt").write_text(txt)
        # warm pass (JIT/codegen/python-worker spawn), then interleaved reps
        reps: dict[str, list[float]] = {n: [] for n in names}
        for name in names:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        for _rep in range(args.reps):
            for name in names:
                spark.sparkContext.setJobDescription(f"timed:{name}")
                t0 = time.monotonic()
                qs[name](spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps[name].append(round(time.monotonic() - t0, 3))
        for name in names:
            out[name] = {"min": min(reps[name]), "reps": reps[name]}
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": _bench.CPUS, "queries": out}))


if __name__ == "__main__":
    main()
