"""Placeholder — filled in as SURVEY.md §7.1 build order reaches it."""
