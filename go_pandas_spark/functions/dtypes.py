"""Dtype bridge: pandas/NumPy dtype strings ↔ Spark types.

Reference parity: the dtype matrix in SURVEY.md §1.3 (blocks in
``pandas/core/internals/blocks.py``, casting in
``pandas/core/dtypes/cast.py``). Decisions baked in: Spark NULL is
the missing value (no int→float coercion), timestamps are µs
precision, uint64 widens to Decimal(20,0).
"""

from __future__ import annotations

from pyspark.sql import types as T

_MAP: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "object": T.StringType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "datetime64[ns]": T.TimestampType(),
    "datetime64[us]": T.TimestampType(),
    "datetime64": T.TimestampType(),
    "timedelta64[ns]": T.DayTimeIntervalType(),
    "category": T.StringType(),
    "binary": T.BinaryType(),
}


def to_spark_type(dtype) -> T.DataType:
    if isinstance(dtype, T.DataType):
        return dtype
    key = str(dtype).lower()
    if key in _MAP:
        return _MAP[key]
    # Fall back to Spark DDL strings ("decimal(10,2)", "array<float>", …)
    return T.StructType.fromDDL(f"c {dtype}")[0].dataType


_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def is_numeric(spark_simple: str) -> bool:
    return spark_simple.split("(")[0] in _NUMERIC


def dtype_family(d) -> str:
    s = str(d).lower()
    if "datetime" in s or "timestamp" in s or "date" in s:
        return "datetime"
    if s.split("(")[0] in _NUMERIC or s.startswith(("int", "uint", "float")) or s == "number":
        return "number"
    if s in ("bool", "boolean"):
        return "bool"
    if s in ("object", "str", "string"):
        return "string"
    return s


def pandas_dtype_to_spark(dt):
    """pandas dtype -> Spark DataType, for schema-from-dtypes paths
    (empty-frame construction, where inference has no rows)."""
    from pyspark.sql import types as T

    s = str(dt).lower()
    if s.startswith("datetime64"):
        return T.TimestampNTZType()
    if s.startswith("timedelta64"):
        return T.DayTimeIntervalType()
    if s in ("int8",):
        return T.ByteType()
    if s in ("int16",):
        return T.ShortType()
    if s in ("int32", "uint16"):
        return T.IntegerType()
    if s.startswith(("int", "uint")):
        return T.LongType()
    if s in ("float32",):
        return T.FloatType()
    if s.startswith("float"):
        return T.DoubleType()
    if s in ("bool", "boolean"):
        return T.BooleanType()
    return T.StringType()
