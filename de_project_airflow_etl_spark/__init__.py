"""PySpark-native analytics engine with the capabilities of
``sjyangkevin/de-project-airflow-etl`` (see SURVEY.md), generalized to a
full relational operator surface plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Architecture: DataFrame / Spark SQL first — declare logical plans, let
Catalyst + AQE pick physical strategies. Python UDFs only where built-ins
genuinely cannot express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"
