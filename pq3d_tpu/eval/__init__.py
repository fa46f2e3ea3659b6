"""Evaluators: host-side numpy metric protocols (SURVEY.md §2.12)."""
