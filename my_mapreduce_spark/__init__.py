"""my_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the computational surface of the
reference MapReduce engine (``/root/reference``: Go MapReduce in the
MIT 6.824 style — coordinator/worker/RPC/shuffle files), built on
idiomatic Spark DataFrame/SQL primitives instead of a hand-rolled
execution engine, and extended with the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns,
streaming) the north star mandates.

Layering:

- ``session``   — SparkSession factory (AQE on, UTC, Arrow on).
- ``io``        — typed loaders for the fixture star schema.
- ``mapreduce`` — reference-parity ``mapreduce()`` compatibility API
  (SURVEY.md §2A: flatMap → hash partition → group → reduce → sink).
- ``registry``  — query registry binding every operator to a Spark
  callable and (where expressible) a DuckDB oracle SQL twin.
- ``queries/``  — the query library (relational, reference-parity,
  text analysis, dedup, similarity, event windows).
- ``functions/``— reusable column expression builders (tokenizers,
  vector math) — JVM-side built-ins first, pandas UDFs second.
- ``streaming``— Structured Streaming jobs over the events table.
- ``multimodal``— binary-column plumbing (decode stubs, real schema).
"""

__version__ = "0.1.0"

# Pickle everything from this package BY VALUE when shipping closures
# to executors: callers (the driver harness, notebooks) may hold
# Python workers that cannot import this repo's path, and the compat
# mapreduce() API ships our functions inside mapInPandas closures.
from pyspark import cloudpickle as _cloudpickle

import my_mapreduce_spark as _self  # noqa: PLW0406

_cloudpickle.register_pickle_by_value(_self)

from my_mapreduce_spark.session import get_spark  # noqa: F401
from my_mapreduce_spark.io import TABLES, load_table, load_tables, register_views  # noqa: F401
