"""Structured Streaming surface (extension — the reference is
batch-only, SURVEY.md §2.7/§7.2 item 3)."""
