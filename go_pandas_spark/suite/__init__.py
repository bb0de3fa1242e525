"""Correctness/benchmark suite: the SURVEY §2 operator inventory as
(Spark query, DuckDB oracle SQL) pairs.

Every query runs through the engine's public API (Frame/Series/
operators), not raw Spark — so the suite exercises the engine the way
a reference user would. Oracles are ANSI SQL for DuckDB on the same
parquet views (driver contract, __spark_entry__.py).

Float determinism: money aggregates are summed as decimals (exact,
engine-independent) and cast/rounded at the end; ratio/statistics
columns are rounded to 6 decimals in BOTH engines.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str):
    from ..sources.io import read_parquet

    return read_parquet(spark, f"{sf_dir}/{table}.parquet")


_MODULES = ["tpch", "tpch2", "relational", "aggregation", "windows", "reshape", "scalars",
            "missing", "llm", "extras"]


def register_all() -> None:
    """Import every suite module (side effect: registration)."""
    import importlib

    for m in _MODULES:
        try:
            importlib.import_module(f".{m}", __package__)
        except ModuleNotFoundError as e:
            if f"suite.{m}" not in str(e):
                raise
