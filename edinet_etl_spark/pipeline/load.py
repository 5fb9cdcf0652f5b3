"""CSV sink (S7/S8 in SURVEY.md §2.1).

Reference behavior (``/root/reference/src/load.py:8-31``): mkdir -p,
refuse to write an empty frame (warn), write one UTF-8 CSV with
header and no index; write errors are logged, not raised
(``tests/test_load.py:48-59`` pins that).

Spark-first shape: ``df.write.csv`` with header; ``coalesce(1)`` is
*opt-in* for single-file parity — at 100 TB you never coalesce to one
file, you keep one file per partition.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


def load_to_csv(
    df: DataFrame,
    output_path: str,
    file_name: str,
    single_file: bool = True,
) -> str | None:
    """Write ``df`` under ``{output_path}/{file_name}``; returns the
    directory written, or None for empty input / write failure."""
    if df.isEmpty():  # S8 empty guard (src/load.py:20-22, main.py:33-35)
        logger.warning("DataFrame is empty. No file will be written.")
        return None
    target = f"{output_path.rstrip('/')}/{file_name}"
    out = df.coalesce(1) if single_file else df
    try:
        out.write.mode("overwrite").option("header", True).csv(target)
    except Exception as e:  # noqa: BLE001 — log-not-raise (test_load.py:48-59)
        logger.error("Failed to save data to %s: %s", target, e)
        return None
    logger.info("Data successfully saved to %s", target)
    return target


def load_to_csv_observed(
    df: DataFrame,
    output_path: str,
    file_name: str,
    single_file: bool = True,
) -> tuple[str | None, dict]:
    """`load_to_csv` with job monitoring via Spark's native Observation
    API: row count, exact revenue total, and null-revenue count are
    accumulated ON the write pass itself (no second scan, no extra
    job) and returned for logging/alerting.

    The reference's monitoring is log lines with hand-computed counts
    re-scanning the frame (`/root/reference/src/extract.py:35,63-65`,
    `src/transform.py:141-144`; README.md:31 lists job monitoring as a
    feature).  `df.observe` is the Spark-native form: metrics ride the
    action, cost nothing extra, and at 100 TB a re-count of the output
    would be a full second pass over the lake.  The revenue total is
    summed in exact decimal (numeric.py discipline), so the observed
    metric is also reproducible run-to-run — usable as a data-quality
    gate, not just telemetry.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics_cols = [F.count(F.lit(1)).alias("n_rows")]
    if "revenue" in df.columns:
        metrics_cols += [
            F.sum(F.col("revenue").cast("decimal(38,0)"))
            .cast("string")
            .alias("revenue_total"),
            F.count(F.when(F.col("revenue").isNull(), 1)).alias("null_revenue"),
        ]
    obs = Observation("pipeline_write")
    observed = df.observe(obs, *metrics_cols)
    target = load_to_csv(observed, output_path, file_name, single_file)
    if target is None:
        # empty-guard / failure path never ran an action; isEmpty()'s
        # probe may or may not have touched the observation — report
        # nothing rather than block on obs.get
        return None, {}
    metrics = dict(obs.get)
    logger.info("Observed write metrics for %s: %s", target, metrics)
    return target, metrics
