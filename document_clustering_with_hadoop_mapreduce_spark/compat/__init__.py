"""Bug-compat shims reproducing the reference's non-standard semantics
(SURVEY.md §2.7 N1-N7) for golden-diff parity. Sane defaults live in the
main operators; nothing here is on the scale path."""

from .shims import clean_text_ref, n3_similarity, assign_nearest_n3  # noqa: F401
