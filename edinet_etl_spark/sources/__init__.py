"""Ingestion sources (SURVEY.md §2.1): company-master CSV scan,
EDINET REST list/download source, ZIP member extraction."""
