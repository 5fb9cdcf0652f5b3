"""Pipeline settings (mirrors ``/root/reference/config/config.py:6-28``
and ``config/settings.env``) as a plain dataclass — no env magic; the
caller decides where values come from (SURVEY §1.1 Config record)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    base_url: str = "https://api.edinet-fsa.go.jp/api/v2"
    api_key: str = ""
    csv_file: str = "data/EdinetcodeDlInfo.csv"
    output_dir: str = "output"
    start_date: str = "2024-01-01"
    end_date: str = "2024-12-31"
    # '120' annual securities report, '130' amended report.
    target_doc_types: list[str] = field(default_factory=lambda: ["120", "130"])
    request_per_second: float = 10.0
    max_retries: int = 3
    retry_delay: float = 1.0
    companies_to_get: int | None = 1000
    fetch_partitions: int = 8
