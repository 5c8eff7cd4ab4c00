"""Incremental ingest: the reference's part-file flow as a stream.

The reference re-reads all `esoa_pt_*.csv` parts every run and
re-tags from scratch (run_drugs_all.py:312-382). Structured Streaming
turns the same layout into incremental processing: a file source
watches the directory, each new part becomes a micro-batch, and
``foreachBatch`` runs the SAME batch tagging plan on just the new
rows — exactly-once per file, no re-tagging of old parts.

At scale this is the 100 TB ingestion path: tagging cost is
O(new data) per trigger instead of O(all data) per run.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ESOA_PART_SCHEMA = T.StructType(
    [
        T.StructField("ITEM_NUMBER", T.StringType()),
        T.StructField("ITEM_REF_CODE", T.StringType()),
        T.StructField("DESCRIPTION", T.StringType()),
    ]
)


def stream_esoa_parts(
    spark: SparkSession,
    directory: str,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    schema: T.StructType = ESOA_PART_SCHEMA,
):
    """Watch a directory of eSOA part CSVs; run ``process_batch``
    (e.g. the tagger plan + sink) per micro-batch. Returns the
    StreamingQuery; callers stop() it or processAllAvailable()."""
    src = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)  # one part per micro-batch
        .csv(directory)
    )
    return (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
