"""Data sources: driver parquet tables, CSV time-series ingest, bucketed parquet storage."""
