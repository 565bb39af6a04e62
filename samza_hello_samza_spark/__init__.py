"""samza_hello_samza_spark — a PySpark-native analytics/stream engine.

Re-expresses every capability of apache/samza-hello-samza (reference:
/root/reference) Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, Structured Streaming for the streaming surface, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB training-data pipeline needs.
"""

__version__ = "0.1.0"
