"""Operators: time-series analytics, relational surface, dedup, similarity, text, multimodal."""
