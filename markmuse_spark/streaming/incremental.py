"""Incremental extraction via Structured Streaming (Trigger.AvailableNow).

The reference's Celery queue is an unbounded stream of task arrivals with
at-least-once execution (SURVEY §2 "Streaming ops"); the batch engine's
analog is an incremental run: new parquet files landing under the pages
root are discovered by the file source, extracted, and committed
effectively-once (checkpointed epochs + idempotent per-epoch partition
overwrite in the sink) — the Spark-native equivalent
of the reference's PENDING->SUCCESS task lifecycle without an external
broker (``clients/celery/app.py`` analog).

``Trigger.AvailableNow`` drains everything available and stops, so the
same job runs as a cron-style incremental batch (A23 analog) and resumes
from the checkpoint on the next invocation.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from markmuse_spark.operators.extract import extract_markdown

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def run_incremental(
    spark: SparkSession,
    pages_root: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> int:
    """Drain all unprocessed page files into the extracted sink.

    Returns the number of rows written in this increment.  The streaming
    checkpoint gives at-least-once epoch delivery; the sink makes the
    epochs idempotent (effectively-once end-to-end) by writing each epoch
    as its own ``epoch_key=<lineage>-<epoch>`` partition with dynamic
    partition overwrite —
    a replayed epoch (crash after the parquet commit but before the
    checkpoint commit) overwrites its own partition instead of appending
    duplicate rows.
    """
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(pages_root)

    extracted = extract_markdown(pages)

    counter = spark.sparkContext.accumulator(0)

    # epoch ids restart at 0 for a NEW checkpoint lineage (cleaned or
    # repointed checkpoint dir) — partitioning on epoch_id alone would let
    # a new lineage's epoch 0 dynamically overwrite the old lineage's
    # epoch-0 data.  Keying the partition by (lineage, epoch) keeps the
    # overwrite idempotent WITHIN a lineage (the replay case) and
    # append-only ACROSS lineages.  The lineage id must be stable across
    # restarts of the SAME checkpoint: normalize the location first —
    # strip a URI scheme (file:/tmp/x == /tmp/x) and resolve scheme-less
    # relative paths (cwd-dependent otherwise).
    import hashlib as _hashlib
    import re as _re

    loc = _re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?", "", checkpoint_dir)
    if not loc.startswith("/"):
        loc = os.path.abspath(loc)
    lineage = _hashlib.md5(loc.rstrip("/").encode("utf-8")).hexdigest()[:8]

    def sink(batch_df, epoch_id: int) -> None:
        # persist so the extraction kernel runs ONCE per micro-batch (the
        # count and the write share the materialized result instead of
        # re-executing the plan twice)
        out = batch_df.withColumn(
            "epoch_key", F.lit(f"{lineage}-{epoch_id}")
        ).persist()
        try:
            n = out.count()
            counter.add(n)
            if n:
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("epoch_key")
                    .parquet(f"{output_dir}/extracted_stream")
                )
        finally:
            out.unpersist()

    query = (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return counter.value


def windowed_throughput(
    spark: SparkSession,
    pages_root: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming windowed aggregation over event time (``warc_ts``):
    docs/bytes per crawl-hour with late-data handling — the watermarked
    event-time shape the reference never had (its progress counters are
    processing-time only, ``base_tasks.py:71-108``)."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(pages_root)
    )
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("html")).alias("total_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "lang",
            "n_docs",
            "total_bytes",
        )
    )
