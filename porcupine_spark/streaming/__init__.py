"""Structured-Streaming surface (additive — SURVEY.md §2.10: the
reference has no watermarks/event-time; its streams are incremental
batch pulls, which plain lazy DataFrames already cover)."""
