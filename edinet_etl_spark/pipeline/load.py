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
