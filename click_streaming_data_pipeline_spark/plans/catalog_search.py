"""Search catalog (SURVEY 2 F) — filled in after core. Placeholder."""
