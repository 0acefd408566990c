"""Structured Streaming operators (micro-batch incremental pipeline)."""
