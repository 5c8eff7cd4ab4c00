"""Local stand-in for the driver's DuckDB-oracle compare.

Runs a catalog query in Spark and its oracle in DuckDB over the same
parquet tables, then compares: row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Floats compare exactly first; a tiny tolerance fallback is
reported as WARN so value-hash risks surface before the driver runs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from pids_drg_esoa_spark.sources.tables import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    exact: bool
    detail: str


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> tuple[bool, bool]:
    """(equal, exact). NaN==NaN; floats get a 1e-9 relative fallback."""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        if a == b:
            return True, True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12), False
    return (a == b, a == b)


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        return CompareResult(
            name, False, False, f"columns differ: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
        )
    if len(sp) != len(du):
        return CompareResult(name, False, False, f"row count differs: spark={len(sp)} duckdb={len(du)}")
    a, b = _canon(sp), _canon(du)
    exact = True
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            eq, ex = _values_equal(x, y)
            if not eq:
                return CompareResult(
                    name, False, False, f"value mismatch col={col} row={i}: spark={x!r} duckdb={y!r}"
                )
            exact = exact and ex
    return CompareResult(name, True, exact, "" if exact else "equal only within float tolerance")
