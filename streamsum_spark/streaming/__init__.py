"""Structured Streaming rendition of the pipeline (SURVEY.md §7 Phase 4)."""
