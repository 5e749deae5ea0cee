"""Query plans: the declared query surface + matching DuckDB oracles."""
