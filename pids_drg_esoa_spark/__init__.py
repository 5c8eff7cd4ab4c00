"""pids_drg_esoa_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query & data-processing
capabilities of the reference pipeline ``carlosresu/pids-drg-esoa``
(batch ETL / entity-matching over Philippine health-claims data), plus
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) that the same engine needs
at 100 TB.

Layout
------
- ``session``    : SparkSession factory tuned for local + cluster use.
- ``sources``    : schema registry, readers (csv/parquet/glob), writers.
- ``functions``  : scalar function library (native expressions first,
                   Arrow pandas_udfs for irreducibly-Python logic).
- ``operators``  : reusable DataFrame operators (dedup, similarity,
                   ranking, text stats, multimodal plumbing).
- ``plans``      : declarative query plans — the oracle-gated catalog
                   plus domain plans (tagger, bridge).
- ``pipelines``  : end-to-end domain pipelines (drugs, labs).
- ``streaming``  : Structured Streaming wrappers.
"""

__version__ = "0.1.0"
