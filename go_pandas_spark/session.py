"""SparkSession bootstrap tuned for this engine.

Local-mode testing (local[N]) with settings that also make sense on a
real cluster: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow on (fast pandas interchange + vectorized
pandas UDFs), UTC session timezone (the reference stores tz-naive
datetime64[ns]; we canonicalize to UTC, see SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "go_pandas_spark", master: str | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    builder = (
        builder.master(master)
        # Shuffle partitions sized for the local test rig; AQE coalesces
        # at runtime so oversizing is cheap, undersizing is not.
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # ANSI mode off: the reference (pandas) has permissive casts and
        # NULL-on-error semantics, not SQL-exception semantics.
        .config("spark.sql.ansi.enabled", "false")
        # The reference stores datetime64[ns]; parquet NANOS columns are
        # read as long and truncated to µs timestamps in read_parquet
        # (deliberate semantic delta, SURVEY.md §1.3).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Read parquet isAdjustedToUTC=false timestamps as session-UTC
        # TIMESTAMP, not TIMESTAMP_NTZ (LTZ-only functions reject NTZ).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Write µs timestamps (not INT96): round-trippable everywhere.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
