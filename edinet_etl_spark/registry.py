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
        pii,
        quality,
        reference_ops,
        relational,
        similarity,
        sketches,
        sql_api,
        subqueries,
        temporal,
        text,
        tpch_rest,
        udf_surface,
    )
    from edinet_etl_spark.streaming import jobs  # noqa: F401


# The driver's correctness sweep checks a ~50-query *prefix* of
# registration order (CORRECTNESS_r01 stopped at 50).  This explicit
# order front-loads one representative per SURVEY §2 row and per
# north-star family — flagship first, then relational/reference_ops
# (the §2.1–§2.10 surface), sql/subquery/udf/multimodal/llmdata-tail/
# temporal/text/similarity/streaming representatives — so a bounded
# sweep still yields a hard correctness signal for every family.
# Modules fully driver-proven in round 1 (analytics, dedup, events,
# llmdata head) sort last; within unlisted queries, family order below
# then registration order.  Names here that stop existing raise at
# lookup time (guarded in _ordered_names).
_PRIORITY: tuple[str, ...] = (
    # flagship + relational §2 surface
    "revenue_by_nation_year", "pricing_summary", "top_unshipped_orders",
    "order_priority_check", "local_supplier_volume", "forecast_revenue_change",
    "filtered_customer_projection", "part_membership_filters",
    "customers_without_orders", "pii_scrub_customers",
    "region_nation_cross", "order_union_all", "table_counts",
    "nullsafe_segment_match", "nation_balance_full_join",
    # reference_ops: A1/A2, F1–F15, P7–P13, L, U
    "best_order_per_customer", "largest_lineitem_per_order",
    "year_offset_decode", "cast_failure_skip", "string_functions",
    "date_functions", "date_range_generation", "deterministic_top_orders",
    "distinct_nation_segments", "segment_intersect",
    "data_quality_checks", "dynamic_value_filter",
    "flag_dispatch", "returnflag_multiset_ops",
    # F14 (round-1 red, oracle type fixed)
    "props_json_decode",
    # SQL API + correlated-subquery representative (Q21)
    "sql_top_nation_per_region", "sql_lateral_top2_orders",
    "suppliers_kept_waiting",
    # UDF surface (Pandas UDF + UDTF)
    "pandas_udf_clipped_balances", "udtf_char_ngrams",
    # multimodal (X1/X2 plumbing)
    "multimodal_decode", "pq_adc_topk",
    # llmdata tail added after round 1's sweep
    "source_mix_report", "corpus_curation_pipeline",
    "triangle_count_copurchase", "token_budget_pack",
    # temporal: as-of join + binned range join
    "asof_latest_order_per_event", "price_neighbor_pairs_binned",
    # text
    "text_stats", "cms_heavy_hitters",
    # similarity: brute-force baseline + LSH ANN scale path
    "cosine_topk_bruteforce", "lsh_bucket_ann",
    # streaming: windowed agg, custom stateful, stream-stream join
    "streaming_tumbling_hourly", "streaming_user_totals",
    "streaming_purchase_attribution",
    # positions 51+: displaced within-family duplicates + the rest of
    # the sketch family — ride a wider driver window if one exists;
    # full local differential coverage regardless
    "doc_chunk_windows", "bloom_prejoin_reduction", "pagerank_event_graph",
    "multimodal_frame_sample", "token_budget_pack_partitioned",
    "tfidf_top_terms", "fulfilled_only_customers_except",
    "suppliers_with_shipments",
)

# Tail order for queries not in _PRIORITY: still-unproven families
# first, round-1-green modules last.
_MODULE_ORDER: tuple[str, ...] = (
    "sketches", "pii", "quality", "temporal", "text", "similarity", "subqueries", "tpch_rest",
    "udf_surface", "jobs", "multimodal", "sql_api", "relational",
    "reference_ops", "llmdata", "events", "dedup", "analytics",
)


def _ordered_names() -> list[str]:
    load_all()
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    head = list(_PRIORITY)
    in_head = set(head)
    mod_rank = {m: i for i, m in enumerate(_MODULE_ORDER)}
    rest = [n for n in QUERIES if n not in in_head]
    reg_rank = {n: i for i, n in enumerate(QUERIES)}
    rest.sort(
        key=lambda n: (
            mod_rank.get(QUERIES[n].__module__.rsplit(".", 1)[-1], len(mod_rank)),
            reg_rank[n],
        )
    )
    return head + rest


def all_queries() -> dict[str, QueryFn]:
    return {n: QUERIES[n] for n in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}


def coverage() -> dict[str, Any]:
    load_all()
    return {
        n: {"oracle": n in ORACLES, "covers": COVERS[n]} for n in _ordered_names()
    }
