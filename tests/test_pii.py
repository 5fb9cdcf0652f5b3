"""Detector-level proof for the PII scrub: the driver fixtures only
exercise ``numeric_id`` (TPC-H names), so email/IPv4/phone are pinned
here on synthetic strings THROUGH THE SAME builders the queries use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from edinet_etl_spark.operators.pii import PII_DETECTORS, detector_counts, scrub

CASES = [
    # (raw, masked, {detector: count})
    (
        "contact alice.smith+x@example.co.uk or bob@corp.io today",
        "contact <EMAIL> or <EMAIL> today",
        {"email": 2},
    ),
    (
        "ping 192.168.0.1 then 10.0.255.254",
        "ping <IPV4> then <IPV4>",
        {"ipv4": 2},
    ),
    (
        "call 25-989-7418 or 030-1234-5678",
        "call <PHONE> or <PHONE>",
        {"phone": 2},
    ),
    (
        "Customer#000000042 ordered 12345 units",
        "Customer#<ID> ordered <ID> units",
        {"numeric_id": 2},
    ),
    # consumption order: the email's digits must NOT leak into
    # numeric_id; the IPv4 must not be eaten digit-run-first
    (
        "id 99999 mail 12345@num.example.com host 8.8.8.8",
        "id <ID> mail <EMAIL> host <IPV4>",
        {"email": 1, "ipv4": 1, "numeric_id": 1},
    ),
    ("no pii here", "no pii here", {}),
]


def test_detectors_on_synthetic_strings(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _, _) in enumerate(CASES)], "i int, t string")
    out = {
        r["i"]: r
        for r in df.select(
            "i", scrub(F.col("t")).alias("masked"), *detector_counts(F.col("t"))
        ).collect()
    }
    for i, (_raw, masked, counts) in enumerate(CASES):
        assert out[i]["masked"] == masked, (i, out[i]["masked"])
        for name, _, _ in PII_DETECTORS:
            assert out[i][f"n_{name}"] == counts.get(name, 0), (i, name)


def test_scrub_is_idempotent(spark):
    """Masking already-masked text changes nothing (tokens contain no
    detector-matchable spans) — safe to re-run the pass."""
    df = spark.createDataFrame([(raw,) for raw, _, _ in CASES], "t string")
    twice = df.select(
        scrub(F.col("t")).alias("once"),
        scrub(scrub(F.col("t"))).alias("twice"),
    ).collect()
    for r in twice:
        assert r["once"] == r["twice"]
