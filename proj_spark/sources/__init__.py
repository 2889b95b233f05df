"""Data sources: deterministic synthetic tables + partitioned sinks."""
