"""Local replica of the driver's Spark-vs-DuckDB comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
(order-insensitively) values — with a small float tolerance so we can
distinguish "semantically wrong" from "last-ulp fp drift" while
iterating. The driver's own check is stricter (value hash), so any
tolerance hit here is flagged loudly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from module8_movies_etl_spark.sources.readers import TPCH_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # array/list cells (e.g. token-id sequences) are unhashable and
    # unsortable in pandas — stringify them, matching the driver's own
    # str()-based value compare
    for col in df.columns:
        if df[col].map(lambda v: isinstance(v, (list, tuple))
                       or type(v).__name__ == "ndarray").any():
            df[col] = df[col].map(
                lambda v: str(list(v)) if v is not None else None
            )
    # normalize value repr: NaN -> None-ish marker, floats rounded hard
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    errors: list[str] = []
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    if len(sp) != len(du):
        errors.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")
        return errors
    sp_cols, du_cols = sorted(map(str.lower, sp.columns)), sorted(map(str.lower, du.columns))
    if sp_cols != du_cols:
        errors.append(f"{name}: columns spark={sp_cols} duckdb={du_cols}")
        return errors
    sp.columns, du.columns = map(str.lower, sp.columns), map(str.lower, du.columns)
    sp, du = _canon(sp), _canon(du)
    for col in sp.columns:
        a, b = sp[col], du[col]
        exact_mismatch = 0
        fuzzy_mismatch = 0
        for x, y in zip(a, b):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                if xn != yn:
                    fuzzy_mismatch += 1
                continue
            if isinstance(x, float) or isinstance(y, float):
                if x != y:
                    exact_mismatch += 1
                    if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                        fuzzy_mismatch += 1
            else:
                if str(x) != str(y):
                    fuzzy_mismatch += 1
        if fuzzy_mismatch:
            ex = [
                (x, y)
                for x, y in zip(a, b)
                if str(x) != str(y)
            ][:3]
            errors.append(f"{name}.{col}: {fuzzy_mismatch} value mismatches, e.g. {ex}")
        elif exact_mismatch:
            errors.append(
                f"{name}.{col}: WARNING {exact_mismatch} within-tolerance fp drifts "
                "(driver hash may still fail)"
            )
    return errors
