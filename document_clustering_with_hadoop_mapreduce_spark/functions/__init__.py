"""Scalar / vector column functions (reference §2.2 P1-P11 equivalents)."""
