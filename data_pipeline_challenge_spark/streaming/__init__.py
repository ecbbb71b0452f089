"""Structured Streaming surface: file-source ingestion with exactly-once
merge, and event-time windowing with watermarks."""
