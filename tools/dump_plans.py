"""Dump `.explain("formatted")` for named registered queries to files.

Used by the optimization rounds to commit before/after plan evidence:

    python tools/dump_plans.py --outdir plans/r11 --suffix _before name...

For queries with an audit_fn seam (iterative loops / streaming jobs
whose returned relation is a materialized result), the audit builder's
plan is dumped — that is the per-round / per-micro-batch dataflow the
query actually executes, the same contract explain_audit relies on.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_mapreduce_spark.caching import release_caches  # noqa: E402
from my_mapreduce_spark.registry import (REGISTRY, CapturedPlan,  # noqa: E402
                                         _ensure_loaded)
from my_mapreduce_spark.session import get_spark  # noqa: E402


def formatted_plan(spark, name: str, sf_dir: str) -> str:
    spec = REGISTRY[name]
    fn = spec.audit_fn or spec.fn
    out = fn(spark, sf_dir)
    if isinstance(out, CapturedPlan):
        return out.formatted
    jqe = out._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    return jqe.explainString(mode.fromString("formatted"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default="plans/r11")
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    _ensure_loaded()
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names:
        try:
            text = formatted_plan(spark, name, args.sf)
        except Exception as exc:
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            continue
        finally:
            release_caches(spark, force_checkpointed=True)
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text if text.endswith("\n") else text + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
