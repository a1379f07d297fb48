"""Scalar function library (SURVEY.md §2.9) — vectorized per-batch UDFs."""
