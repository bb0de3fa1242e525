"""go_pandas_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference pandas fork
(smartech7/go-pandas, pandas ~0.24.0-dev).

Architecture (SURVEY.md §7): a pandas-like lazy Frame/Series API whose
every operator compiles to Spark DataFrame/SQL plans — Catalyst and
Tungsten are the optimizer and execution engine. Beyond the
reference's surface, `operators.dedup` / `operators.similarity` /
`operators.text` / `operators.multimodal` add the large-scale
training-data-pipeline operators, and `streaming/` mirrors the
time-series surface onto Structured Streaming.
"""

from __future__ import annotations

from .frame import Frame
from .series import Series
from .session import get_spark, warmup
from .sources.io import (
    json_normalize,
    read_csv,
    read_feather,
    read_fwf,
    read_json,
    read_orc,
    read_parquet,
    read_sql,
    to_orc,
    to_sql,
    read_table,
    to_csv,
    to_dict,
    to_feather,
    to_records,
    read_pickle,
    to_pickle,
    to_latex,
    to_html,
    to_hdf,
    to_json,
    to_parquet,
    to_string,
)
from .operators.joins import (
    concat,
    combine_first,
    merge,
    merge_asof,
    merge_ordered,
    range_join,
    salted_merge,
)
from .operators.reshape import (
    crosstab,
    cut,
    get_dummies,
    melt,
    pivot,
    pivot_table,
    qcut,
    stack,
    unstack,
    wide_to_long,
)
from .functions.datetimes import (add_offset, bdate_range, custom_business_day_add, date_range,
                                  period_range, timedelta_range, to_datetime, to_numeric, to_timedelta)
from .frame import register_frame_accessor
from .sources.io import write_bucketed
from .streaming.ops import sessionize_batch
from . import testing
from .options import get_option, option_context, reset_option, set_option
from ._internal import clear_cache

__version__ = "0.1.0"

__all__ = [
    "Frame", "Series", "get_spark",
    "read_parquet", "read_csv", "read_json", "read_table", "read_fwf", "read_sql", "to_sql",
    "json_normalize", "to_parquet", "to_csv", "to_json", "to_dict", "to_string",
    "read_feather", "to_feather", "to_records", "read_pickle", "to_pickle",
    "to_latex", "to_html", "to_hdf",
    "write_bucketed",
    "concat", "combine_first", "merge", "merge_asof", "merge_ordered",
    "range_join", "salted_merge",
    "melt", "pivot", "pivot_table", "crosstab", "get_dummies", "cut", "qcut",
    "stack", "unstack", "wide_to_long",
    "to_datetime", "to_numeric", "to_timedelta", "date_range", "bdate_range",
    "period_range", "timedelta_range", "add_offset", "custom_business_day_add",
    "register_frame_accessor", "sessionize_batch",
    "factorize", "unique", "value_counts", "isna", "isnull", "notna",
    "notnull", "eval", "clear_cache", "warmup",
]


# ---- pandas top-level function forms (delegate to the method forms) ----
def factorize(values):
    """pd.factorize(series) — (codes Series, uniques list)."""
    return values.factorize()


def unique(values):
    return values.unique()


def value_counts(values, **kw):
    return values.value_counts(**kw)


def isna(obj):
    return obj.isna()


def notna(obj):
    return obj.notna()


isnull = isna
notnull = notna


def eval(expr: str, local_dict: dict | None = None, frame=None):  # noqa: A001
    """pd.eval over a Frame context (``computation/eval.py``): the
    engine form requires the frame explicitly (no stack inspection)."""
    if frame is None:
        raise TypeError("gp.eval needs frame= (no implicit frame from "
                        "the call stack, unlike pandas)")
    return frame.eval(expr, local_dict=local_dict)

DataFrame = Frame  # pandas-name alias: gp.DataFrame(...) works like pd.DataFrame via Frame


def register(frame, name: str) -> None:
    """Expose a Frame to the SQL frontend as a temp view (index levels
    included as columns named by their labels)."""
    frame.to_spark(index=bool(frame._index_names)).createOrReplaceTempView(name)


def sql(query: str, spark=None) -> "Frame":
    """ANSI SQL over registered frames — the full Spark SQL surface
    (joins, windows, CTEs, lateral views) returning an engine Frame."""
    spark = spark or get_spark()
    return Frame(spark.sql(query))
