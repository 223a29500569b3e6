"""Vanilla-session sweep THROUGH THE DRIVER SEAM — committed gate.

The external driver consumes ``__spark_entry__.queries()`` /
``oracle_sql()`` with its OWN plain SparkSession (no session-factory
confs, default driver memory). Rounds 6-7 ran this sweep ad hoc and
narrated the result in BASELINE.md; the round-7 verdict (item 8)
promoted it to a committed artifact: VANILLA_LOCAL.json, regenerated
by tools/round_close.py and pinned by tests/test_registry_hygiene.py.

What the seam catches that check_correctness.py (our session
factory) cannot:
- confs that only exist in my_mapreduce_spark.session.get_spark
  (e.g. the parquet-nanos conf io.load_table must set dynamically);
- driver-memory discipline: a default-size vanilla JVM OOMs after
  ~150 queries at sf0.1 unless every query's caller-owned caches are
  released (the documented release_caches(force_checkpointed=True)
  per-query contract this sweep exercises);
- accidental dependence on registry internals the driver never
  imports.

Usage:
    python tools/vanilla_sweep.py [--sf DIR] [--out VANILLA_LOCAL.json] [name ...]

Subset runs merge into the existing artifact (the check_correctness
incremental pattern) so a per-commit spot check keeps the artifact
registry-complete without a full re-run. Exit 1 on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from check_correctness import _normalize  # noqa: E402 (shared compare)

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(_ROOT,
                                                  "VANILLA_LOCAL.json"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # the seam: a PLAIN builder (ui off only — it binds ports in CI),
    # never my_mapreduce_spark.session.get_spark
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("vanilla-sweep")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    import __spark_entry__ as entry
    queries, oracles = entry.queries(), entry.oracle_sql()
    names = args.names or list(queries)

    # cache release is the HARNESS's job (caller-owned lifecycle):
    # without it a default-memory vanilla JVM accumulates persisted
    # state and OOMs mid-sweep (BASELINE.md round-7 record)
    from my_mapreduce_spark.caching import release_caches

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    record: dict[str, dict] = {}
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
        except Exception as exc:
            failures.append(name)
            record[name] = {"ok": False, "rows": None,
                            "err": f"spark: {exc}"[:300]}
            print(f"  {name}: ERROR {exc}")
            continue
        finally:
            release_caches(spark, force_checkpointed=True)
        if name not in oracles:
            record[name] = {"ok": True, "rows": len(sdf),
                            "err": "no_oracle"}
            print(f"  {name}: rows-only ({len(sdf)}) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        odf = con.sql(oracles[name]).df()
        ok, err = True, None
        if len(sdf) != len(odf):
            ok, err = False, f"rows spark={len(sdf)} oracle={len(odf)}"
        elif sorted(sdf.columns) != sorted(odf.columns):
            ok, err = False, "columns differ"
        elif not _normalize(sdf).equals(_normalize(odf)):
            ok, err = False, "values differ"
        record[name] = {"ok": ok, "rows": len(sdf), "err": err}
        print(f"  {name}: {'OK' if ok else 'MISMATCH ' + str(err)} "
              f"({len(sdf)} rows) [{time.time() - t0:.1f}s]")
        if not ok:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} pass "
          f"through the vanilla seam")
    if args.names and os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
        merged["queries"].update(record)
        record = {k: v for k, v in merged["queries"].items()
                  if k in queries}
    with open(args.out, "w") as f:
        json.dump({"sf": args.sf, "queries": record}, f,
                  indent=1, sort_keys=True)
    print(f"wrote {args.out} ({len(record)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
