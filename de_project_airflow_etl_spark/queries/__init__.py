"""Query modules — the generalized relational surface (SURVEY.md §7.2)."""
