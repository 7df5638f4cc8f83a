"""Relational/iterative operators: thread propagation, analytics,
dedup, similarity search, text analysis."""
