"""Differential comparison harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate (row-count + schema + order-insensitive
value compare) so every oracle is validated locally before the driver
runs it. Comparison is EXACT (no float tolerance) — queries are written
to be bit-deterministic across engines (see exprs.py); if a query can't
be, it must be registered rows-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from pokertracker_cassandra_st_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    """Canonical string form of one cell (engine-agnostic).

    None and NaN both canonicalize to missing: pandas float columns
    already collapse SQL NULL to NaN, so the distinction is a frame-
    representation artifact (e.g. NULL booleans arrive as None from
    Spark but np.nan from DuckDB), not an engine difference.
    """
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # signed zero is NOT collapsed: the driver's value hash
        # distinguishes -0.0 from 0.0 (found round 9 — q_fn_geo was
        # locally green under the old collapse but driver hash-red).
        # repr() renders '-0.0' vs '0.0', matching driver strictness;
        # queries whose zeros can carry a sign must canonicalize with
        # `+ 0.0` on BOTH engine sides (see functions/scalar.py geo).
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon(x) for x in seq) + "]"
    return repr(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return rows


def _canon_dtype(dt) -> str:
    """Engine-facing dtype class: int width unified only per family."""
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return f"int{dt.itemsize * 8}"
    if k == "f":
        return f"float{dt.itemsize * 8}"
    if k == "M":
        return "timestamp"
    if k == "b":
        return "bool"
    return "object"


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    # dtype-strict: a driver that hashes schemas would flag width drift
    mism = [
        (c, _canon_dtype(spark_pdf[c].dtype), _canon_dtype(oracle_pdf[c].dtype))
        for c in spark_pdf.columns
        if _canon_dtype(spark_pdf[c].dtype) != _canon_dtype(oracle_pdf[c].dtype)
    ]
    assert not mism, f"{name}: dtype mismatch (col, spark, oracle): {mism}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (row_idx, spark, oracle):\n"
            + "\n".join(repr(d) for d in diffs)
        )
