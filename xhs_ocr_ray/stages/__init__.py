"""Distributed stages over ray.data.Dataset: dedup, merges, lineage, search."""
