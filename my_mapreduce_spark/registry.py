"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2 (and every north-star extension) is
registered here as a :class:`QuerySpec`: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, where the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string computing the same
result over the same parquet tables. The driver hash-compares the
two (row count + schema + order-insensitive value hash), so:

- every computed/aggregate column is aliased identically on both
  sides;
- floating aggregates are rounded to a fixed precision on both
  sides (summation order differs between engines);
- timestamps are emitted as DATE or STRING, never raw timestamp
  columns (Spark timestamp_ntz vs DuckDB TIMESTAMP arrow types
  differ).

This registry is the analogue of the reference's plugin loader
(``main/mrworker.go:35-52`` loads one Map/Reduce pair from a .so);
here the "plugins" are plain Python callables over DataFrames.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry.

    >>> @register("q1", oracle="SELECT ...")
    ... def q1(spark, sf_dir): ...
    """

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                   doc=doc or (fn.__doc__ or ""), tags=tuple(tags))
        return fn

    return wrap


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every query module so its @register calls run."""
    global _loaded
    if _loaded:
        return
    import my_mapreduce_spark.queries  # noqa: F401  (side-effect imports)
    _loaded = True
