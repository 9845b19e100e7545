"""watermill_spark — a PySpark-native event-stream + analytics engine.

A from-scratch re-expression of the capabilities of ThreeDotsLabs/watermill
(reference studied read-only at /root/reference; see SURVEY.md) on top of
Apache Spark:

- ``message``   : the Message row schema (uuid/metadata/payload/topic/event_time)
- ``sources``   : topic transports (in-memory, parquet-dir, kafka, rate)
- ``streaming`` : Router, handlers, middleware (Structured Streaming)
- ``operators`` : relational/analytics operators (joins incl. as-of, windows,
                  dedup families, similarity search, text analysis)
- ``analytics`` : the declared query surface checked against a DuckDB oracle

Design stance (SURVEY.md §7): keep watermill's observable contracts (no loss,
redelivery on failure, per-key ordering, metadata fidelity, dedup / poison /
delay / requeue semantics) on Spark's native execution model — DataFrames,
Catalyst, micro-batch checkpointing — instead of emulating channels and
per-message acks.
"""

__version__ = "0.1.0"
