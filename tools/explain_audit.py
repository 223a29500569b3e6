"""Plan-quality audit: inspect the physical plan of every registered
query and flag scale smells.

Checks, per query:
- **pushed**  — parquet scans carry PushedFilters when the query
  filters on scan columns (predicate reached the reader);
- **pruned**  — no scan reads all columns of a wide table unless the
  query needs them (ReadSchema column count vs table width);
- **bcast**   — joins against small dimension tables use
  BroadcastHashJoin, not a shuffled join;
- **codegen** — the plan contains WholeStageCodegen spans;
- **cartesian** — no CartesianProduct / BroadcastNestedLoopJoin
  unless the query is explicitly a theta/cross join.

Usage: python tools/explain_audit.py [--sf DIR] [name ...]
Exit code 1 if any non-whitelisted smell is found.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_mapreduce_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from my_mapreduce_spark.session import get_spark  # noqa: E402

# Queries where a nested-loop/cartesian shape is the declared intent
# (theta joins, tiny broadcast tile grids) or where streaming exec
# hides the batch plan.
_ALLOW_NESTED_LOOP = {
    "q_theta_join_price_band",   # non-equi price band join (declared)
    "q_scalar_subquery",         # scalar subquery = 1-row broadcast NLJ
    "q_dedup_ngram_jaccard",     # pair join carries a < on doc_id
    "q_dedup_exact_pairs",
    "q_knn_bruteforce",          # declared O(n^2) verifier
    "q_knn_lsh_buckets",         # corpus scan x broadcast query sketches:
                                 # the hamming prune lives in the join cond
}
_SKIP = {
    "q_streaming_hourly", "q_streaming_sessionize",  # micro-batch exec
    "q_dedup_clusters",  # returns the converged cached relation; the
                         # per-round join+agg plans (which do codegen)
                         # already executed inside the driver loop
}


def audit(name: str, plan: str, codegen_subtrees: int) -> list[str]:
    smells = []
    if codegen_subtrees == 0:
        smells.append("no-codegen")
    if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) \
            and name not in _ALLOW_NESTED_LOOP:
        smells.append("nested-loop-join")
    # every equi-join with nation/region/supplier/part/customer should broadcast
    if re.search(r"SortMergeJoin", plan) and re.search(
            r"Scan parquet[^\n]*(nation|region|supplier)", plan):
        smells.append("shuffled-dim-join")
    return smells


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()
    _ensure_loaded()
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps the plan in an unexecuted AdaptiveSparkPlan that
    # reports 0 codegen subtrees; disable it for static inspection
    # (production sessions keep it on — session.py).
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    names = args.names or [n for n in REGISTRY if n not in _SKIP]
    bad = 0
    for name in names:
        if name in _SKIP:
            continue
        df = REGISTRY[name].fn(spark, args.sf)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        qe = df._jdf.queryExecution()
        plan = qe.explainString(mode.fromString("formatted"))
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                      qe.explainString(mode.fromString("codegen")))
        smells = audit(name, plan, int(m.group(1)) if m else 0)
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        bcast = plan.count("BroadcastHashJoin")
        tag = "SMELL " + ",".join(smells) if smells else "ok"
        print(f"  {name}: {tag} (pushed_scans={pushed} bcast_joins={bcast})")
        if args.verbose and smells:
            print(plan)
        bad += bool(smells)
    print(f"{len(names) - bad}/{len(names)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
