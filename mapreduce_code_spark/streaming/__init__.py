"""Structured Streaming over the events table (north-star extension —
the reference is pure batch, SURVEY §2.10)."""
