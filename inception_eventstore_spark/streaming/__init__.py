"""Structured Streaming ingest & derived-view maintenance."""
