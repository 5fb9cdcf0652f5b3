"""End-to-end reference-parity ETL (SURVEY.md §3): ingestion sources →
filing parse → year decode → company join → CSV sink."""
