"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``go_pandas_spark/suite/`` — one module per
SURVEY.md §2 operator family — and run through the engine's public
Frame/Series API.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _suite():
    from go_pandas_spark.suite import QUERIES, ORACLES, register_all

    register_all()
    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    q, _ = _suite()
    return q["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _suite()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    _, o = _suite()
    return dict(o)
