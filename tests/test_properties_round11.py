"""Round-11 focused tests (optimization round 2/2).

Covers the internals changed this round: the BPE degenerate-corpus
guard the round-10 advisor asked for (the folded argmax aggregate
returns one all-null row on an empty pair set instead of the old loud
IndexError — the guard restores loud failure).
"""

from __future__ import annotations

import pytest


def test_bpe_learn_merges_raises_loud_on_exhausted_corpus(spark):
    """A corpus of single-symbol words has NO mergeable pair at round
    1: the folded min(struct)/sum aggregate collects an all-null row,
    and _bpe_learn_merges must raise instead of silently building a
    '·None··None·' replace literal (round-10 ADVICE item)."""
    from edinet_etl_spark.operators.llmdata import _bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a b")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no symbol pairs left at round 1"):
        _bpe_learn_merges(spark, docs)
