"""The reference pipeline, Spark-native: incremental JSON ingest ->
nested-struct transform -> partitioned parquet zones -> catalog table
-> flagship aggregate (SURVEY.md §3.1/§7.1 minimum slice)."""
