"""LLM-data-pipeline operators (SURVEY.md §7.2 item 4): deduplication,
similarity search, text analysis, multimodal column plumbing.

All hot-path logic is JVM-side built-ins (higher-order array functions,
md5, hash-aggregates); Python appears only in the Arrow-batched
multimodal stubs where per-byte work is genuinely non-relational.
"""
