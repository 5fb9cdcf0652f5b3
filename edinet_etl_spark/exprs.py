"""Shared compared-column expressions: ONE definition of any formula
that multiple operator modules feed into the oracle compare, so a
change (e.g. to the revenue formula or its decimal discipline) cannot
silently diverge between queries that are supposed to agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The TPC-H discounted revenue term, identically spelled on both
# engines (the Spark Column is built lazily — Column ops need an
# active SparkContext, so no module-level Column objects).
SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


def revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
