"""transformWithStateInPandas — Spark 4's arbitrary-stateful API.

UNADVERTISED OPTIONAL EXTRA: the operator's Python↔state-server wire
protocol requires protobuf, which this sandbox does not ship (and
installs are off-limits), so the query has never executed here and is
NOT claimed in SURVEY.md §2's operator surface. It registers only
where the dependency exists; the advertised arbitrary-stateful
operator is the ``applyInPandasWithState`` sessionization in
``streaming/jobs.py``, which sweeps with a full oracle every round.

The successor to ``applyInPandasWithState`` (which
``streaming/jobs.py:158`` uses for sessionization): typed state
handles (value/list/map), per-key timers, TTL, and initial-state
seeding, executed against the RocksDB state store. Here it maintains
a per-user running (event count, value sum) — the simplest stateful
shape whose final emission is exactly the batch group-by, so the
query carries a FULL DuckDB oracle.

Scale shape (100 TB): state is one fixed-width row per user in
RocksDB (spillable off-heap, incremental checkpoints); each
micro-batch shuffles only its own rows by user_id. Update-mode
emissions are per-key-per-batch, so the sink sees a monotone series
per user; the final answer is the argmax-by-count row per user —
selected here with one ``max_by``-style struct max, not a re-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.registry import register
from my_mapreduce_spark.streaming.jobs import _event_stream, _run_to_memory

_ROCKSDB = ("org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider")

_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"
_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _make_processor():
    """StatefulProcessor maintaining (count, sum) per user; built
    function-local (imports pull streaming internals) the same way
    jobs.py scopes its sessionizer closure."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningAgg(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((int(n), float(total)))
            yield pd.DataFrame({"user_id": [int(key[0])],
                                "n_events": [int(n)],
                                "sum_value": [total]})

        def close(self) -> None:
            pass

    return RunningAgg()


def run_tws_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the transformWithStateInPandas running aggregate to
    completion and reduce update-mode emissions to the final row per
    user (count is strictly increasing, so max-by-count is exact)."""
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                         None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    try:
        stream = _event_stream(spark, sf_dir).select("user_id", "value")
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_processor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        sink = _run_to_memory(spark, out, "tws", "update")
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old)
    final = (
        sink.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n_events"),
                F.round(F.col("s.sum_value"), 4).alias("sum_value"))
    )
    return final


def _protobuf_available() -> bool:
    """transformWithState's Python↔state-server protocol is protobuf;
    the sandbox does not ship it (and pip install is off-limits), so
    the query registers only where the runtime dependency exists —
    the code path itself is complete and oracle-gated."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def q_streaming_tws_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-state running aggregate via transformWithStateInPandas,
    gated by the exact batch group-by oracle."""
    return run_tws_running_agg(spark, sf_dir)


TWS_ORACLE = """
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY user_id
"""

if _protobuf_available():  # pragma: no cover — sandbox lacks protobuf
    register(
        "q_streaming_tws_running_agg",
        oracle=TWS_ORACLE,
        tags=("streaming", "stateful", "transformWithState", "events"),
    )(q_streaming_tws_running_agg)
