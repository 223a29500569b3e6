"""Reference-parity MapReduce compatibility API.

Reproduces the reference engine's exact programming model (SURVEY.md
§2A; ``/root/reference/mr/worker.go:39-75``): the user supplies

- ``mapf(key, value) -> iterable[(key, value)]`` — the flatMap
  (reference: ``mapf func(string, string) []KeyValue``,
  ``mr/worker.go:39``), and
- ``reducef(key, values: list[str]) -> str`` — the per-key reduce
  over the COMPLETE value list (``mr/worker.go:40``, invoked once
  per distinct key at ``mr/worker.go:204``).

Spark-first implementation notes:

- The map stage runs via ``mapInPandas`` (Arrow-batched, one Python
  interpreter round-trip per batch), not a row-at-a-time RDD
  flatMap.
- The shuffle/sort/group of ``mr/worker.go:125-203`` (JSON
  intermediate files, FNV-32a ``ihash`` partitioner, per-partition
  sort, run-detection grouping) is Spark's own shuffle +
  ``groupBy(key).agg(collect_list(value))``. Per-key value order is
  unspecified — exactly the reference's contract (values arrive in
  nondeterministic shuffle-file order; apps that care sort inside
  reduce, e.g. ``mrapps/indexer.go:38``).
- Reduce is NOT restricted to commutative/associative functions, so
  the general path materializes the per-key value list. This is the
  one place the reference's semantics fight partial aggregation: at
  100 TB a hot key's value list must fit an executor. Queries that
  are actually algebraic should use native DataFrame aggregates
  (see queries/reference_parity.py for the fast paths); this API is
  the parity surface.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MapF = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceF = Callable[[str, list[str]], str]

_KV_SCHEMA = "key string, value string"


def map_stage(df: DataFrame, mapf: MapF) -> DataFrame:
    """Apply ``mapf`` over a two-column (key, value) DataFrame,
    producing the intermediate (key, value) stream."""
    kcol, vcol = df.columns[0], df.columns[1]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys: list[str] = []
            vals: list[str] = []
            for k, v in zip(pdf[kcol], pdf[vcol]):
                for ok, ov in mapf(k, v):
                    keys.append(ok)
                    vals.append(ov)
            yield pd.DataFrame({"key": keys, "value": vals})

    return df.mapInPandas(run, schema=_KV_SCHEMA)


def reduce_stage(mapped: DataFrame, reducef: ReduceF, n_reduce: int = 10) -> DataFrame:
    """Group the intermediate stream by key and apply ``reducef`` to
    each key's complete value list.

    ``n_reduce`` mirrors the reference's hard-coded 10 reduce
    partitions (``main/mrcoordinator.go:26``) but is only a final
    layout knob — the grouping shuffle itself uses
    ``spark.sql.shuffle.partitions`` (+ AQE coalescing).
    """
    grouped = mapped.groupBy("key").agg(F.collect_list("value").alias("values"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf["key"],
                "value": [reducef(k, list(vs)) for k, vs in zip(pdf["key"], pdf["values"])],
            })

    return grouped.repartition(n_reduce, "key").mapInPandas(run, schema=_KV_SCHEMA)


def mapreduce(df: DataFrame, mapf: MapF, reducef: ReduceF, n_reduce: int = 10) -> DataFrame:
    """Full job: map → shuffle/group → reduce. Returns (key, value)
    string columns, the reference's output record shape."""
    return reduce_stage(map_stage(df, mapf), reducef, n_reduce)


def write_text_output(result: DataFrame, path: str, n_reduce: int = 10) -> None:
    """Text sink with the reference's output contract
    (``mr/worker.go:190-207``): ``"<key> <value>"`` lines, one file
    per reduce partition, sorted by key within each partition."""
    (
        result.repartition(n_reduce, "key")
        .sortWithinPartitions("key")
        .select(F.concat_ws(" ", F.col("key"), F.col("value")).alias("line"))
        .write.mode("overwrite").text(path)
    )
