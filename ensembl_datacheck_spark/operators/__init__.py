"""Operators: the four north_rule check families (column stats,
uniqueness, referential integrity, distribution drift) plus the
training-data-pipeline operators (dedup, similarity, text analysis,
multimodal plumbing)."""
