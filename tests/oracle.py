"""DuckDB-oracle comparison harness (mirrors the driver's t2 gate).

Canonicalization per FIXTURES.md: sort columns by name, sort rows by
all columns, round floats, NULL==NaN, then compare values.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canonicalize(pdf: pd.DataFrame, round_to: int = 6) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(round_to)
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = s.dt.floor("us").astype("datetime64[us]")
        elif s.dtype == object:
            pdf[c] = s.astype(str)
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            pdf[c] = s.astype(str)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)
    return pdf


def _assert_tz_parity(got_raw: pd.DataFrame, exp_raw: pd.DataFrame, name: str) -> None:
    """Fail on tz-awareness mismatch BEFORE canonicalization strips it.

    The driver compares raw schemas and typed value hashes: a DuckDB
    TIMESTAMPTZ (e.g. from to_timestamp(BIGINT)) vs a naive Spark
    timestamp is a driver-red even though values align after UTC
    normalization. Catch it locally so local green implies driver green
    (this is how datetime_floor_round escaped to the r4 driver).
    """
    for c in set(got_raw.columns) & set(exp_raw.columns):
        g_tz = isinstance(got_raw[c].dtype, pd.DatetimeTZDtype)
        e_tz = isinstance(exp_raw[c].dtype, pd.DatetimeTZDtype)
        assert g_tz == e_tz, (
            f"{name}: column {c!r} tz-awareness mismatch: spark "
            f"{got_raw[c].dtype} vs oracle {exp_raw[c].dtype} — the driver's "
            f"raw schema compare fails on this; make both sides naive "
            f"(DuckDB: make_timestamp(us) instead of to_timestamp(s))")


def assert_matches_oracle(spark_df, con, oracle_sql: str, round_to: int = 6, name: str = "") -> None:
    got_raw = spark_df.toPandas()
    exp_raw = con.execute(oracle_sql).df()
    _assert_tz_parity(got_raw, exp_raw, name)
    got = canonicalize(got_raw, round_to)
    exp = canonicalize(exp_raw, round_to)
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch\n spark: {list(got.columns)}\n duck:  {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    # The driver's value-hash is type-sensitive: 3 (int64) and 3.0
    # (float64) hash differently even though isclose() passes. Enforce
    # matching numpy kind per column so local green implies driver green.
    for c in got.columns:
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        assert gk == ek, (
            f"{name}: column {c!r} dtype-kind mismatch: spark {got[c].dtype} "
            f"({gk}) vs duck {exp[c].dtype} ({ek}) — align the engine "
            f"projection and oracle SQL cast")
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga = pd.to_numeric(g, errors="coerce").to_numpy(dtype="float64")
            ea = pd.to_numeric(e, errors="coerce").to_numpy(dtype="float64")
            both_nan = np.isnan(ga) & np.isnan(ea)
            # BIT equality after round(6) canonicalization — the driver
            # hashes canonicalized values, it does not rtol-compare. A
            # query that needs looseness here will hash-flake at the
            # driver too; fix the query (decimal money, ROUND(,6) ratios),
            # not the harness.
            same = ga.view("int64") == ea.view("int64")
            ok = bool(np.all(both_nan | same))
            bad = ~(both_nan | same)
        else:
            bad = (g.astype(str) != e.astype(str)).to_numpy()
            ok = not bad.any()
        if not ok:
            sample = pd.DataFrame({"spark": g[bad].head(5), "duck": e[bad].head(5)})
            raise AssertionError(
                f"{name}: column {c!r} differs in {int(bad.sum())} rows\n{sample}")
