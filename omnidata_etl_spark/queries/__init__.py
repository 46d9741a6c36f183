"""Declared query builders (SURVEY.md §2B), grouped by operator family."""
