"""Structured Streaming pipelines over the events table (SURVEY D6-D8)."""
