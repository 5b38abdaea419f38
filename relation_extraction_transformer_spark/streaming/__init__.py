"""Structured Streaming surfaces of the engine (incremental ingest)."""
