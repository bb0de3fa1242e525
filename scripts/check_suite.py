#!/usr/bin/env python3
"""Run every suite query against its DuckDB oracle and report.

Usage: python scripts/check_suite.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from go_pandas_spark import get_spark  # noqa: E402
from go_pandas_spark.suite import QUERIES, ORACLES, register_all  # noqa: E402
from tests.oracle import assert_matches_oracle, duck_connect  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    register_all()
    spark = get_spark()
    con = duck_connect(sf_dir)
    failed = []
    for name, fn in QUERIES.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in ORACLES:
                assert_matches_oracle(sdf, con, ORACLES[name], name=name)
                status = "OK "
            else:
                n = sdf.count()
                status = f"ROWS-ONLY({n}) "
                assert n >= 0
        except Exception as e:  # noqa: BLE001
            status = "FAIL"
            failed.append(name)
            sys.stderr.write(f"--- {name} ---\n{traceback.format_exc()}\n")
            if isinstance(e, AssertionError):
                sys.stderr.write(f"{e}\n")
        sys.stderr.write(f"{status:>14} {name} ({time.time() - t0:.1f}s)\n")
    sys.stderr.write(f"\n{len(QUERIES) - len(failed)}/{len(QUERIES)} passed\n")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
