"""data_pipeline_challenge_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capability surface of
``pcustic/data-pipeline-challenge`` (FastAPI + RabbitMQ + MongoDB ingestion
pipeline, see SURVEY.md) as an idiomatic Spark engine:

- ``sources``   — landing zone, JSON normalization, ledger table
- ``operators`` — keyed merge (the reference's bulk upsert), relational ops,
                  dedup, similarity search, text analysis, multimodal plumbing
- ``functions`` — reusable column-expression helpers (text, vector)
- ``plans``     — the declared query inventory (drives the oracle gate)
- ``streaming`` — Structured Streaming ingestion + event-time windows

Everything is DataFrame-first: logical plans are declared via the DataFrame
API and Catalyst/Tungsten choose the physical strategy. Python UDFs appear
only where built-ins cannot express the semantics (Arrow-batched, never
row-at-a-time).
"""

__version__ = "0.1.0"
