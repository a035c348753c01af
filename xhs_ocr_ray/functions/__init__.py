"""Scalar / vectorized functions: normalization, hashing, text statistics."""
