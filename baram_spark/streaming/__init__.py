"""Streaming / incremental ingest (Structured Streaming surface)."""
