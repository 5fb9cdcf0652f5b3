"""Static lint over every registered DuckDB oracle string: ban
engine-version-sensitive constructs (VERDICT r6 task 2).

The r06 driver red (`kaplan_meier_conversion`) came from the one
oracle relying on `list_reduce(list(factor) OVER ...)` — neither the
frame order of a windowed `list()` nor `list_reduce`'s seedless fold
association is a documented cross-version guarantee, and a float
product is ULP-sensitive to fold order.  This test keeps the registry
free of that class:

- `list_reduce` / bare `reduce(` — seedless lambda folds whose
  association is engine-defined;
- `list(...)`/`array_agg(...)` co-occurring with `OVER` — window-frame
  list aggregates whose element order is engine-defined (use
  `list_sort`/`array_sort` over a plain group aggregate, a recursive
  CTE, or an order-pinned struct-array fold instead);
- nondeterministic value sources (`random(`, `now(`, `current_date`,
  `current_timestamp`) — oracles must be pure functions of the
  parquet fixtures.
"""

from __future__ import annotations

import re

from edinet_etl_spark import registry


def _violations(name: str, oracle: str) -> list[str]:
    low = oracle.lower()
    out = []
    if "list_reduce" in low:
        out.append("list_reduce (engine-defined fold association)")
    if re.search(r"(?<![\w.])reduce\s*\(", low):
        out.append("seedless reduce( (engine-defined fold association)")
    has_over = re.search(r"\bover\b", low) is not None
    if has_over and re.search(r"(?<![\w.])list\s*\(", low):
        out.append("list() in an oracle using OVER (frame order is engine-defined)")
    if has_over and re.search(r"(?<![\w.])array_agg\s*\(", low):
        out.append("array_agg() in an oracle using OVER (frame order is engine-defined)")
    for tok in ("random(", "now(", "current_date", "current_timestamp"):
        if tok in low:
            out.append(f"nondeterministic {tok}")
    return out


def test_oracles_free_of_engine_version_sensitive_constructs():
    registry.load_all()
    assert registry.ORACLES, "registry loaded no oracles"
    bad = {
        name: v
        for name, oracle in registry.ORACLES.items()
        if (v := _violations(name, oracle))
    }
    assert not bad, f"engine-version-sensitive oracle constructs: {bad}"


def test_kaplan_meier_oracle_is_recursive_cte():
    """The r06-red query must stay on the order-pinned construct."""
    registry.load_all()
    o = registry.ORACLES["kaplan_meier_conversion"]
    assert "WITH RECURSIVE" in o
    assert "list_reduce" not in o.lower()
