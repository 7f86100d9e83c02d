"""Incremental / streaming seams (batch-first per SURVEY.md §2.6)."""
