"""Vectorized (Arrow/pandas) scalar functions and deterministic hashing."""
