"""Relational operators: views (query layer), verify, decode, maintenance,
dedup, similarity, text analysis."""
