"""Dataflow operators: seen-set/Bloom dedup, frontier scheduling,
versioning/sweep, near-duplicate families, similarity search.
"""
