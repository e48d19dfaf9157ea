"""Structured Streaming: ingestion into bucketed parquet + windowed aggregation."""
