"""Dataset combinators: relational ops, dedup, similarity, scoring, smoothing."""
