#!/usr/bin/env python3
"""Per-query profiling for the optimization rounds: warm time, number
of Spark jobs, number of stages/tasks, and shuffle exchange count in
the final plan.

Usage: python scripts/profile_queries.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from go_pandas_spark import get_spark  # noqa: E402
from go_pandas_spark.suite import QUERIES, register_all  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    filters = sys.argv[2:]
    register_all()
    spark = get_spark("profile")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # JVM warmup

    names = [n for n in QUERIES
             if not filters or any(f in n for f in filters)]
    out = {}
    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, sf_dir).count()  # warm (codegen/plan)
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": repr(e)[:200]}
            sys.stderr.write(f"{name}: ERR {e}\n")
            continue
        tracker = sc.statusTracker()
        sc.setJobGroup(f"prof_{name}", name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_plan = time.time() - t0
        df.count()
        wall = time.time() - t0
        jobs = tracker.getJobIdsForGroup(f"prof_{name}")
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        sc.setJobGroup(None, None)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange")
        n_reuse = plan.count("ReusedExchange")
        n_py = (plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
                + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
                + plan.count("MapInArrow"))
        out[name] = {"warm_sec": round(wall, 3),
                     "plan_sec": round(t_plan, 3),
                     "jobs": len(jobs), "stages": n_stages,
                     "tasks": n_tasks,
                     "exchange": n_exch - n_reuse, "reused_exchange": n_reuse,
                     "python_nodes": n_py}
        sys.stderr.write(f"{name}: {wall:.2f}s plan={t_plan:.2f}s "
                         f"jobs={len(jobs)} stages={n_stages} tasks={n_tasks} "
                         f"exch={n_exch - n_reuse}+{n_reuse}r py={n_py}\n")
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
