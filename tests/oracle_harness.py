"""Replica of the driver's correctness comparison: run each __spark_entry__
query on Spark and its oracle SQL on DuckDB over the same parquet tables,
compare row count + order-insensitive value hash (columns sorted by name,
rows sorted by stringified values)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return str(v)
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return rows


def compare(spark_df, oracle_rows: pd.DataFrame) -> tuple[bool, str]:
    got = canon(spark_df.toPandas())
    exp = canon(oracle_rows)
    if len(got) != len(exp):
        return False, f"row count {len(got)} vs {len(exp)}"
    if got != exp:
        diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"{len(got)} rows"
