"""Beyond-reference extension catalog (dedup / similarity / text /
multimodal) — filled in after core. Placeholder."""
