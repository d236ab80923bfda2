"""Inverted-index build: posting codec, build pipeline, stats, lineage."""
