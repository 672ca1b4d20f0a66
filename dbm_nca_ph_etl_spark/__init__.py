"""dbm_nca_ph_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL pipeline
(``ItIsMeMyselfAndI/dbm-nca-ph-etl``) as idiomatic PySpark:

- the reference's pandas transform stage becomes pure DataFrame
  operators (``operators/``),
- its scrape/extract/load edges become Spark sources and sinks
  (``sources/``, ``sinks.py``),
- its SQS/Lambda fan-out topology becomes Spark partitioning and
  Structured Streaming (``streaming/``),
- and, per the project north star, LLM-data-pipeline operators
  (dedup, similarity search, multimodal columns, text analysis) are
  added as first-class components designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst owns the plan;
Python UDFs appear only where the JVM genuinely cannot express the
semantics (PDF table extraction).
"""

__version__ = "0.1.0"
