#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir by
replicating every table K times with consistent key offsets — the
at-scale datapoint generator (VERDICT r5 "Next round" #2): the driver
ships sf0.001/0.01/0.1 only, and the 100 TB design claims need at
least one measurement above the bench scale to expose superlinear
terms (the round-2 scale-killers only surfaced above the verify
scale).

Faithfulness choices, so the scaled corpus stresses the same plan
shapes instead of degenerate ones:
- All BIGINT entity keys get replica offsets (i · 10^7), and foreign
  keys get the SAME offset, so join fan-outs and per-key cardinalities
  match the base distribution (replica i's orders reference replica
  i's customers, etc.).
- customer/supplier names are re-derived from the offset key
  ('Customer#%09d' — the generator's own format), because at a real
  larger SF names stay UNIQUE; verbatim copies would hand the ER
  queries 10-way name cliques that no generator would produce.
- part names repeat heavily BY DESIGN at every SF (64 distinct at
  20k parts) — copied verbatim.
- documents get a 3-char replica suffix (text || ' r<i>', n_chars
  updated): exact duplicate rate stays at the base corpus's natural
  level while the near-dup families still see realistic clusters.
- events/orders keep their timestamps: a bigger SF means denser
  traffic over the same span, matching how the driver's generator
  scales row counts, not time ranges.
- embeddings are copied with offset ids (duplicate vectors = tie-rich
  ANN input — harmless for plan-shape timing; brute-force cosine is
  quadratic by design and excluded from the scale set anyway).

Usage: python tools/make_scaled_sf.py [K] [SRC] [DST]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=<repo>/.scratch/sf1.0
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10_000_000  # per-replica key offset, far above any base key


def make(k: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def write(name: str, sql: str) -> None:
        out = f"{dst}/{name}.parquet"
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, "
            "ROW_GROUP_SIZE 16384)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    rep = f"(SELECT unnest(range({k})) AS i)"
    write("region", f"SELECT * FROM {t('region')}")
    write("nation", f"SELECT * FROM {t('nation')}")
    write(
        "customer",
        f"""SELECT c_custkey + i*{OFF} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + i*{OFF} AS VARCHAR), 9, '0')
                   AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')}, {rep}""",
    )
    write(
        "supplier",
        f"""SELECT s_suppkey + i*{OFF} AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + i*{OFF} AS VARCHAR), 9, '0')
                   AS s_name,
               s_nationkey, s_acctbal
        FROM {t('supplier')}, {rep}""",
    )
    write(
        "part",
        f"""SELECT p_partkey + i*{OFF} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {t('part')}, {rep}""",
    )
    write(
        "orders",
        f"""SELECT o_orderkey + i*{OFF} AS o_orderkey,
               o_custkey + i*{OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, {rep}""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey + i*{OFF} AS l_orderkey,
               l_partkey + i*{OFF} AS l_partkey,
               l_suppkey + i*{OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}, {rep}""",
    )
    write(
        "events",
        f"""SELECT event_id + i*{OFF} AS event_id, ts,
               user_id + i*{OFF} AS user_id,
               event_type, value, props
        FROM {t('events')}, {rep}""",
    )
    write(
        "documents",
        f"""SELECT doc_id + i*{OFF} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' r' || CAST(i AS VARCHAR) END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE n_chars + 3 + length(CAST(i AS VARCHAR)) - 1
               END AS n_chars
        FROM {t('documents')}, {rep}""",
    )
    write(
        "embeddings",
        f"""SELECT vec_id + i*{OFF} AS vec_id, embedding, label
        FROM {t('embeddings')}, {rep}""",
    )


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(repo, ".scratch", "sf1.0")
    )
    make(k, src, dst)
