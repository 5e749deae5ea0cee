"""Relational / text / ML operators (reference §2.2-§2.6 equivalents)."""
