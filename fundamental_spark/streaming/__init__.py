"""Structured Streaming tier: micro-batch ingestion + windowed aggs."""
