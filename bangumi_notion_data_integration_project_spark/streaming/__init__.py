"""Structured Streaming restatements (SURVEY §2.7): incremental merge
as foreachBatch, windowed/sessionized aggregations with watermarks."""
