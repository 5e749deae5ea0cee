"""Sources & sinks (reference §2.1 S1-S13 equivalents)."""
