"""Query/oracle registry backing ``__spark_entry__``.

Each operator module registers its queries with the ``@query``
decorator; ``__spark_entry__.queries()`` / ``oracle_sql()`` read the
accumulated dicts.  A query is a ``(spark, sf_dir) -> DataFrame``
callable; its oracle is the equivalent ANSI SQL DuckDB runs over the
same parquet tables (views ``region nation customer supplier part
orders lineitem events documents embeddings``).

Contract discipline (BASELINE.md t2):
- every computed column aliased identically on both sides;
- float aggregates go through ``numeric.dsum`` (order-independent);
- any LIMIT is preceded by a total ORDER BY;
- queries whose semantics aren't SQL-expressible register with
  ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# SURVEY.md §2 operator ids each query exercises (for COVERAGE.md).
COVERS: dict[str, list[str]] = {}


def query(name: str, oracle: str | None = None, covers: list[str] | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        COVERS[name] = covers or []
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run (idempotent)."""
    from edinet_etl_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        events,
        llmdata,
        multimodal,
        reference_ops,
        relational,
        similarity,
        sql_api,
        subqueries,
        temporal,
        text,
        tpch_rest,
        udf_surface,
    )
    from edinet_etl_spark.streaming import jobs  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def coverage() -> dict[str, Any]:
    load_all()
    return {n: {"oracle": n in ORACLES, "covers": COVERS[n]} for n in QUERIES}
