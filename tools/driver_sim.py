"""Local stand-in for the driver's correctness gate.

Runs catalog queries under a VANILLA SparkSession (Spark 4 defaults,
ANSI on — the driver's environment, not our tuned one) and compares
row count + sorted-column value multiset against the DuckDB oracle.

Usage:
    python tools/driver_sim.py                 # all oracle-backed queries
    python tools/driver_sim.py flagship_order_histogram text_stats ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/driver_sim.py

A full run (no name args) also writes ``CORRECTNESS_local.json`` at the
repo root — the driver's CORRECTNESS_r{N}.json schema over the WHOLE
catalog, refreshed locally because the driver's own artifact samples
only the first 50 entries.

NB: DuckDB results are fetched via fetchall(), NOT fetchdf() — pandas
coerces SQL NULL to NaN which falsely breaks string-compare parity.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    queries = e.queries()
    oracles = e.oracle_sql()
    names = sys.argv[1:] or list(queries)
    full_run = not sys.argv[1:]
    results: dict[str, dict] = {}
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf)
            scols = sorted(sdf.columns)
            srows = sorted(tuple(str(r[c]) for c in scols) for r in sdf.collect())
        except Exception as exc:  # noqa: BLE001 - record, keep going
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": -1, "oracle_rows": -1,
                "err": str(exc)[:500],
            }
            print(f"{name:32s} ERROR {exc}")
            continue
        if name not in oracles:
            results[name] = {
                "rows_match": len(srows) >= 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": "rows-only (no oracle)",
            }
            print(f"{name:32s} rows-only  spark={len(srows)}  {time.time()-t0:.1f}s")
            continue
        cur = con.execute(oracles[name])
        ocols_raw = [d[0] for d in cur.description]
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        orows = sorted(tuple(str(row[i]) for i in order) for row in cur.fetchall())
        ok = (
            len(srows) == len(orows)
            and scols == sorted(ocols_raw)
            and hashlib.md5(str(srows).encode()).hexdigest()
            == hashlib.md5(str(orows).encode()).hexdigest()
        )
        status = "OK " if ok else "FAIL"
        results[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": scols == sorted(ocols_raw),
            "hash_match": ok,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
        }
        if not ok:
            failures.append(name)
            diff = [
                (a, b) for a, b in zip(srows[:2000], orows[:2000]) if a != b
            ][:3]
            print(f"{name:32s} {status} spark={len(srows)} oracle={len(orows)} "
                  f"cols={scols == sorted(ocols_raw)} first_diffs={diff}")
        else:
            print(f"{name:32s} {status} rows={len(srows)}  {time.time()-t0:.1f}s")
    spark.stop()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_local.json",
    )
    if full_run:
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {out} ({len(results)} queries)")
    elif (
        not failures
        and os.path.exists(out)
        and sf == "/root/testdata/sf0.01"
    ):
        # Named runs MERGE their (green) rows into the existing file,
        # preserving catalog order, so adding/fixing a few queries
        # keeps the artifact fresh without a 15-minute full sweep.
        # Failed named runs never touch the artifact, and neither do
        # runs at a non-default SPARK_GRAFT_SF_DIR — the artifact is
        # an sf0.01 snapshot and mixed-scale rows would corrupt it
        # (the same clobber class bench.py has with BENCH_DETAIL).
        with open(out) as fh:
            existing = json.load(fh)
        existing.update(results)
        merged = {n: existing[n] for n in queries if n in existing}
        with open(out, "w") as fh:
            json.dump(merged, fh, indent=1)
        print(f"merged {len(results)} rows into {out} ({len(merged)} total)")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
