"""Structured Streaming pipelines and their batch-checkable analogs."""
