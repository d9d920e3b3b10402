"""DataFrame operators: one module per capability cluster (SURVEY §2)."""
