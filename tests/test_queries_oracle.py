"""Differential tests: every registered query vs its DuckDB oracle at
SF_DIR (default sf0.01 — the same scale the driver's t2 gate uses).

This mirrors the driver's CORRECTNESS check exactly (row-count + schema
+ order-insensitive value hash) but stricter: floats compare bit-exact.
"""

from __future__ import annotations

import pytest

from edinet_etl_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle, spark_result

registry.load_all()
ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, oracle, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    n = assert_matches_oracle(df, oracle, registry.ORACLES[name], name=name)
    assert n >= 0


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, name):
    cols, rows = spark_result(registry.QUERIES[name](spark, SF_DIR))
    assert len(cols) > 0
    assert len(rows) >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["nation", "order_year", "revenue", "n_items"]
