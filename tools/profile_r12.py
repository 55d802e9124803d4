#!/usr/bin/env python
"""Round-12 optimization profiler.

For each named query (or a --top N slice of the committed
BENCH_DETAIL ordering): run it warm in a shared bench-config session
(noop sink, N samples), print per-sample timings, and dump
``explain('formatted')`` to ``plans/r12/<query>_<tag>.txt``.

Usage:
    python tools/profile_r12.py --tag before customer360_golden ...
    python tools/profile_r12.py --tag before --top 20
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_r12.py ...

Plans are captured from the same DataFrame object that is timed, so
the committed plan files match the measured code exactly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N most expensive committed entries")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from module8_movies_etl_spark.plans import benchmark_queries as bq
    from module8_movies_etl_spark.session import get_spark

    names = list(args.names)
    if args.top:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)
        mach = set(detail.get("machinery", []))
        order = sorted(
            (
                (k, v)
                for k, v in detail["queries"].items()
                if isinstance(v, (int, float)) and v > 0 and k not in mach
            ),
            key=lambda kv: -kv[1],
        )
        names += [k for k, _ in order[: args.top] if k not in names]

    spark = get_spark(
        "profile_r12",
        extra_conf={"spark.sql.codegen.cache.maxEntries": "4096"},
    )
    # same warmups as bench.py (JVM, Python worker pool)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _idpdf(it):
        yield from it

    spark.range(256).repartition(32).mapInPandas(_idpdf, "id long").count()

    plan_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in names:
        fn = bq.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        raw: list[float] = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            raw.append(round(time.perf_counter() - t0, 3))
        out[name] = raw
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        print(f"{name}: min {min(raw)} s  samples {raw}", flush=True)
    print(json.dumps({k: min(v) for k, v in out.items()}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
