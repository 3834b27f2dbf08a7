"""iceberg_kafka_connect_spark — a PySpark-native re-expression of the
databricks/iceberg-kafka-connect streaming-ingestion engine, plus the
large-scale training-data-pipeline operators a 100 TB lakehouse needs.

The reference (see /root/reference, SURVEY.md) is a Kafka→Iceberg sink
connector: record conversion/coercion, routing, CDC merge via equality
deletes, schema evolution, and a coordinated exactly-once commit protocol.
Here those semantics are re-expressed Spark-first:

- record conversion  → Catalyst cast/projection expressions (convert.py)
- SMT transform chain → composable DataFrame transforms (transforms/)
- routing            → filters / foreachBatch fan-out (routing.py)
- CDC merge          → last-wins dedup + merge-on-read lakehouse sink (sinks/)
- commit protocol    → Structured Streaming micro-batch + atomic snapshot
                       commit with batch-id idempotence (streaming/)
- plus operators/    → dedup, similarity search, text analysis, multimodal
"""

__version__ = "0.1.0"
