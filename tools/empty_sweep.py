"""Run EVERY registered query against zero-row copies of the fixture
tables — the whole-registry robustness sweep behind the sampled
pytest suites (tests/test_empty_input.py enumerates the high-risk
seams; this covers the tail so a new query with an unguarded
driver-side scalar can't hide).

Round-5 record: 315/315 queries return a typed result (often 0 rows,
sometimes a legitimate all-zero summary row) with zero crashes.

Usage: python tools/empty_sweep.py    (exit 0 iff no query raises)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_mapreduce_spark.caching import release_caches  # noqa: E402
from my_mapreduce_spark.io import TABLES, load_table  # noqa: E402
from my_mapreduce_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from my_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    _ensure_loaded()
    spark = get_spark("empty-sweep", master="local[8]",
                      extra_confs={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="sf_empty_sweep_")
    for t in TABLES:
        (load_table(spark, "/root/testdata/sf0.001", t)
         .limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    fails = []
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, out).count()
        except Exception as exc:
            fails.append(name)
            print(f"  {name}: FAIL {str(exc).splitlines()[0][:120]}")
        finally:
            release_caches(spark)
    print(f"{len(REGISTRY) - len(fails)}/{len(REGISTRY)} queries survive "
          "zero-row inputs")
    if fails:
        print("failed:", ", ".join(fails))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
