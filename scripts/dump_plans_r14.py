#!/usr/bin/env python3
"""Dump .explain("formatted") for the r14-touched queries.

Usage: python scripts/dump_plans_r14.py <out_dir> <suffix> [name...]
  out_dir: e.g. plans/r14
  suffix:  "before" (run from the pre-round worktree) or "after"

Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

TOUCHED = [
    # r14: merge_asof struct-key carry fast path; dedup_components
    # singleton anti-join; expanding-median fused grid; ewm_mean
    # grouped width-prune + groupby.ewm kernel; suite plan memo (q5);
    # try_element_at/density hardening (fill/cum/moments families)
    "merge_asof_global_noby",
    "merge_asof_nearest",
    "merge_asof_backward",
    "dedup_components",
    "expanding_median_approx_global",
    "ewm_mean",
    "q5_local_supplier_volume",
    "ffill_global_limit",
    "interpolate_global_linear",
    "cumulative_ungrouped_global",
    "expanding_moments_global",
    "resample_hourly",
]


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or TOUCHED
    os.makedirs(out_dir, exist_ok=True)
    from go_pandas_spark import get_spark
    from go_pandas_spark.suite import QUERIES, register_all

    register_all()
    spark = get_spark("plans_r14")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            sys.stderr.write(f"{name}: NOT REGISTERED (skipped)\n")
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building {name}: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        sys.stderr.write(f"{name}: dumped {suffix}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
