#!/usr/bin/env python3
"""Cold-start decomposition probe (r10, VERDICT r9 #6).

Each variant runs in a FRESH subprocess JVM: three representative
queries at sf0.1 (LSH dedup — the worst cold offender, the fused
moments flagship, and the relational q1), timed individually, session
startup excluded. Variants flip one factor each:

  default      — engine defaults (AQE on, whole-stage codegen on)
  aqe_off      — spark.sql.adaptive.enabled=false
  codegen_off  — spark.sql.codegen.wholeStage=false
  warmup       — session.warmup(spark) first (its cost reported)

Usage: python scripts/coldstart_probe.py [sf_dir]
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
variant = {variant!r}
conf = json.loads({conf!r})
import go_pandas_spark as gp
from go_pandas_spark.session import warmup
spark = gp.get_spark("coldprobe")
for k, v in conf.items():
    spark.conf.set(k, v)
out = {{"variant": variant}}
if variant == "warmup":
    out["warmup_s"] = warmup(spark)
from go_pandas_spark.suite import QUERIES, register_all
register_all()
sf = {sf!r}
for q in ["dedup_minhash_lsh", "expanding_moments_global", "q1_pricing_summary"]:
    t0 = time.time()
    QUERIES[q](spark, sf).count()
    out[q] = round(time.time() - t0, 2)
print("PROBE " + json.dumps(out))
"""

VARIANTS = {
    "default": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "codegen_off": {"spark.sql.codegen.wholeStage": "false"},
    "warmup": {},
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for variant, conf in VARIANTS.items():
        code = CHILD.format(repo=repo, variant=variant,
                            conf=json.dumps(conf), sf=sf)
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=900)
        for line in (r.stdout + r.stderr).splitlines():
            if line.startswith("PROBE "):
                print(line[6:], flush=True)
                break
        else:
            print(json.dumps({"variant": variant, "error": r.stderr[-500:]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
