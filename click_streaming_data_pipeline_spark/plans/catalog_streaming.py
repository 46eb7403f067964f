"""Streaming catalog (SURVEY 2 A, I) — filled in after core.
Placeholder."""
