"""Structured Streaming surface (SURVEY.md §2.9 mapping): the event
feed as a stream, with watermarked windows, sessionization, in-stream
dedup, and a custom stateful operator."""
