#!/usr/bin/env python3
"""r14 scale probe (VERDICT r13 #7): the 8v32-core ratios at sf0.1 sit
at ≈1 suite-wide — after r13 removed the data-path shuffles, sf0.1 is
fixed-driver-cost-bound and can no longer distinguish data-path wins
from driver-overhead wins. This probe rebuilds the top bench kernels'
inputs at 10× the sf0.1 rows (an "sf1 synthetic": each table unioned
10× with shifted keys so joins stay 1:1 per copy and group counts
scale), runs the REAL suite queries over them, and reports warm
medians — run it at SPARK_GRAFT_CPUS=32 and =8 and compare.

    SPARK_GRAFT_CPUS=32 python scripts/scale_probe_r14.py [factor] [out_dir]

Expected shape (SCALE.md r14): the scan/join-bound set (q1/q3/q10)
slows markedly at quarter cores; the blocked kernels scale with data
(10× rows ≫ 10× sf0.1 time would flag a driver bottleneck) and stay
flat-or-better per row at fewer cores.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES_TO_PROBE = [
    "q1_pricing_summary", "q3_shipping_priority", "q10_returned_items",
    "ffill_global_limit", "interpolate_global_linear",
    "cumulative_ungrouped_global", "expanding_moments_global",
    "expanding_median_approx_global", "ewm_var_noadjust_global",
    "ewm_cov_corr_global", "rolling_ungrouped_global", "ewm_mean",
    "merge_asof_global_noby", "merge_asof_nearest",
]

COPY_SMALL = ["nation", "region", "supplier", "part",
              "documents", "embeddings"]


def build(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from go_pandas_spark.sources.io import read_parquet

    os.makedirs(out_dir, exist_ok=True)

    def write(sdf, name, nparts):
        sdf.repartition(nparts).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet")

    # user_id deliberately NOT shifted: the ewm_var/cov queries filter
    # `user_id < 200` and ewm_mean groups by it — unshifted ids scale
    # the kernel input 10× (deeper groups) instead of filtering the
    # copies away; ts shifts by i µs so copies interleave in order
    ev = read_parquet(spark, f"{SF_SRC}/events.parquet").to_spark() \
        .drop("__order__")
    parts = []
    for i in range(factor):
        parts.append(ev.select(
            (F.col("event_id") + i * 10_000_000).alias("event_id"),
            F.timestamp_micros(F.unix_micros("ts") + F.lit(i)).alias("ts"),
            "user_id", "event_type", "value", "props"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    write(u, "events", 2 * factor)

    li = read_parquet(spark, f"{SF_SRC}/lineitem.parquet").to_spark() \
        .drop("__order__")
    parts = [li.withColumn("l_orderkey",
                           F.col("l_orderkey") + i * 100_000_000)
             for i in range(factor)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    write(u, "lineitem", 4 * factor)

    od = read_parquet(spark, f"{SF_SRC}/orders.parquet").to_spark() \
        .drop("__order__")
    parts = [od.withColumn("o_orderkey", F.col("o_orderkey") + i * 100_000_000)
               .withColumn("o_custkey", F.col("o_custkey") + i * 10_000_000)
             for i in range(factor)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    write(u, "orders", factor)

    cu = read_parquet(spark, f"{SF_SRC}/customer.parquet").to_spark() \
        .drop("__order__")
    parts = [cu.withColumn("c_custkey", F.col("c_custkey") + i * 10_000_000)
             for i in range(factor)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    write(u, "customer", factor)

    for t in COPY_SMALL:
        read_parquet(spark, f"{SF_SRC}/{t}.parquet").to_spark() \
            .drop("__order__").write.mode("overwrite") \
            .parquet(f"{out_dir}/{t}.parquet")


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/gps_sfx{factor}"

    from go_pandas_spark import get_spark
    from go_pandas_spark.suite import QUERIES, register_all

    register_all()
    spark = get_spark("scale_probe_r14")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    only = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    probe_list = ([q for q in only.split(",") if q] if only
                  else QUERIES_TO_PROBE)

    if not os.path.exists(f"{out_dir}/events.parquet"):
        sys.stderr.write(f"building {factor}x tables under {out_dir}\n")
        build(spark, factor, out_dir)

    spark.read.parquet(f"{out_dir}/lineitem.parquet").count()  # JVM warmup
    results: dict = {}
    for name in probe_list:
        fn = QUERIES[name]
        t0 = time.time()
        n = fn(spark, out_dir).count()
        cold = round(time.time() - t0, 3)
        reps = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, out_dir).count()
            reps.append(round(time.time() - t0, 3))
        results[name] = {"warm_median": sorted(reps)[1], "warm": reps,
                         "cold": cold, "rows": n}
        sys.stderr.write(f"{name}: {sorted(reps)[1]}s warm "
                         f"(cold {cold}s, {n} rows, reps {reps})\n")
    print(json.dumps({"factor": factor, "cpus": cpus,
                      "queries": {k: v["warm_median"]
                                  for k, v in results.items()},
                      "detail": results}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
