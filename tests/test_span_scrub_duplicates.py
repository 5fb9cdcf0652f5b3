"""Duplicate-text coverage for `duplicate_span_scrub` (ADVICE r6,
medium): the sf0.01 fixture has ZERO byte-identical duplicate texts,
so the default differential gate exercises the canonical-collapse
rewrite only with mult == 1 — the sum(mult) window weighting and the
fingerprint fan-back join would pass trivially even if broken.

This test builds a fixture that forces every interesting regime and
compares the Spark query against the per-instance DuckDB oracle
(which never collapses — it scrubs each instance independently), so
the weighting and fan-back must reproduce per-instance semantics
exactly:

- a text with THREE byte-identical copies whose 8-token windows occur
  nowhere else → the windows are duplicated ONLY via multiplicity
  (sum(mult) = 3 ≥ 2); wrong weighting leaves them unscrubbed;
- two distinct texts sharing an 8-token run → cross-text duplication
  at mult 1 (the path sf0.01 already covers);
- a unique text (nothing scrubbed) and a short text (< window width,
  no windows at all) as controls.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from edinet_etl_spark import registry
from tests.conftest import assert_matches_oracle

registry.load_all()

_SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-token window
_TRIPLED = "red orange yellow green blue indigo violet ultraviolet tail"


def _docs() -> pd.DataFrame:
    texts = {
        1: _TRIPLED,
        2: _TRIPLED,
        3: _TRIPLED,
        4: f"prefix one two {_SHARED} suffix",
        5: f"{_SHARED} other words entirely here now",
        6: "unique words that never repeat anywhere in this corpus at all",
        7: "too short",
    }
    return pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["test"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    )


@pytest.fixture(scope="module")
def dup_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("span_dup_sf")
    _docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_span_scrub_weighted_collapse_matches_per_instance_oracle(
    spark, dup_sf_dir
):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{dup_sf_dir}/documents.parquet'"
    )
    try:
        df = registry.QUERIES["duplicate_span_scrub"](spark, dup_sf_dir)
        assert_matches_oracle(
            df,
            con,
            registry.ORACLES["duplicate_span_scrub"],
            name="duplicate_span_scrub[dup-fixture]",
        )
    finally:
        con.close()


def test_span_scrub_duplicate_copies_are_scrubbed(spark, dup_sf_dir):
    """The tripled text's windows occur nowhere else: only sum(mult)
    weighting can mark them duplicated.  All three copies must lose
    their full 9-token island and share the canonical clean_fp."""
    rows = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["duplicate_span_scrub"](
            spark, dup_sf_dir
        ).collect()
    }
    for doc_id in (1, 2, 3):
        r = rows[doc_id]
        assert r["n_dup_windows"] == 2, r  # windows at s=1 and s=2
        assert r["n_islands"] == 1, r
        assert r["tokens_removed"] == 9, r
        assert r["clean_tokens"] == 0, r
    assert rows[1]["clean_fp"] == rows[2]["clean_fp"] == rows[3]["clean_fp"]
    # controls: unique + short texts untouched
    for doc_id in (6, 7):
        assert rows[doc_id]["tokens_removed"] == 0
        assert rows[doc_id]["clean_tokens"] == rows[doc_id]["n_tokens"]
    # cross-text duplication at mult 1 still detected
    assert rows[4]["n_dup_windows"] == 1
    assert rows[5]["n_dup_windows"] == 1
