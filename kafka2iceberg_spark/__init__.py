"""kafka2iceberg_spark — a PySpark-native streaming/CEP analytics engine.

A from-scratch re-expression of the capabilities of naive-zhang/kafka2iceberg
(Flink + Iceberg CDC ingestion, reference at /root/reference) as an idiomatic
PySpark Structured Streaming engine, extended with the windowing / session /
stateful-join / exactly-once surface required by the project north star and a
set of large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): declarative DataFrame ops compiled by Catalyst
wherever possible; Arrow-vectorized pandas UDFs only where state or per-group
ordering demands it; zero custom Catalyst rules; no per-row Python anywhere.
"""

__version__ = "0.1.0"
