"""Shared blocking helpers: the ranked sub-block salt used by every
block-then-compare operator (LSH buckets, embedding blocks, semdedup
cells, fuzzy-match blocks).

Split rule: n_sub = ceil(B / cap); salt = (rank − 1) mod n_sub with
rank ordered inside the block.  Round-robin keeps sub-blocks within
one of each other in size (⌈B/n_sub⌉ ≤ cap), so for cap ≥ 3 no
sub-block is ever a singleton, and pair work within a block becomes
linear in block size (≤ B·cap/2) instead of B²/2.  Oracles mirror the
expression with `sql_ranked_salt` so the Spark and DuckDB splits are
generated from ONE definition and cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def ranked_salt(part_cols: list[str], order_col: str, cap: int) -> Column:
    """Balanced sub-block id within each ``part_cols`` block, ranking
    by ``order_col``."""
    w_rank = Window.partitionBy(*part_cols).orderBy(order_col)
    w_all = Window.partitionBy(*part_cols)
    n_sub = F.ceil(F.count("*").over(w_all) / F.lit(cap))
    return (F.row_number().over(w_rank) - F.lit(1)) % n_sub


def sql_ranked_salt(part_cols: list[str], order_col: str, cap: int) -> str:
    """The identical expression in the Spark-SQL ∩ DuckDB dialect."""
    parts = ", ".join(part_cols)
    return (
        f"(ROW_NUMBER() OVER (PARTITION BY {parts} ORDER BY {order_col}) - 1)"
        f" % CAST(CEIL(COUNT(*) OVER (PARTITION BY {parts})"
        f" / {cap}.0) AS BIGINT)"
    )
