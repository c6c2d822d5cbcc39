"""parquet_processor_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference ETL system
(johntrue15/Parquet-Processor): parquet/JSON/CSV sources and sinks, the
relational operator family (filters, joins, aggregations, windows, set
ops), the scrape-pipeline analog (mapInPandas fetch with retry/timeout/
dead-letter), streaming semantics (checkpointed incremental processing,
event-time windows), and LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns).

Design: one SparkSession; everything relational is declared with the
DataFrame/SQL API so Catalyst handles pushdown, pruning, join selection,
and AQE; Python only crosses the JVM boundary through Arrow-batched
Pandas UDFs (the fetch stage, multimodal decode stubs).
"""

__version__ = "0.1.0"
