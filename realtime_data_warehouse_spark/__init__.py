"""realtime_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of the reference
real-time data warehouse (seedoilz/realtime-data-warehouse, a
Flink 1.17 / Java layered Kappa warehouse — see SURVEY.md) as an
idiomatic Spark engine:

- DataFrame / SQL declarative plans, optimized by Catalyst
- Structured Streaming for the streaming layer (watermarks, windowed
  aggregation, applyInPandasWithState for irreducible keyed state)
- parquet-backed warehouse tables (ODS→DIM/DWD→DWS layering)
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal column plumbing) designed for 100 TB
  inputs via shuffle-aware partitioning.

Nothing in here is a translation of the reference's Java runtime;
SURVEY.md §2 citations in docstrings map each operator to the
reference behavior it re-expresses.
"""

__version__ = "0.1.0"
