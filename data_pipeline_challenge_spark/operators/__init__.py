"""Engine operators: keyed merge, dedup family, similarity search, text,
multimodal plumbing. Each module documents which reference behavior
(SURVEY.md §2 row) or north-star capability it implements."""
