"""Vectorized rule kernels, one module per type family (SURVEY.md §2.3)."""
