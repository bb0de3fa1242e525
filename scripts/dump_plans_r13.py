#!/usr/bin/env python3
"""Dump .explain("formatted") for the r13-touched queries.

Usage: python scripts/dump_plans_r13.py <out_dir> <suffix> [name...]
  out_dir: e.g. plans/r13
  suffix:  "before" (run from the pre-round worktree) or "after"

Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

TOUCHED = [
    # prior-session batches: plan-memoized reads, origin capture off,
    # carry fast path, dense_row_number, width-pruned summaries,
    # lineage truncation (semdedup / cached_grams)
    "interpolate_global_linear",
    "ffill_global_limit",
    "cumulative_ungrouped_global",
    "expanding_moments_global",
    "expanding_median_approx_global",
    "ewm_var_noadjust_global",
    "ewm_cov_corr_global",
    "semdedup_embeddings",
    "dedup_components",
    "dedup_minhash_lsh",
    "merge_asof_global_noby",
    "q5_local_supplier_volume",
]


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or TOUCHED
    os.makedirs(out_dir, exist_ok=True)
    from go_pandas_spark import get_spark
    from go_pandas_spark.suite import QUERIES, register_all

    register_all()
    spark = get_spark("plans_r13")
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
