"""Structured Streaming surface (X8): windowed aggregation, watermarks,
streaming dedup, custom stateful operators."""
