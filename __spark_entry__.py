"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship end-to-end extraction — the Common-Crawl-style pages
corpus (plus sf0.001 ``documents`` wrapped as HTML payloads) run through the
salted, size-bucketed extraction pipeline, summarized per language.

``queries``/``oracle_sql``: the operator registry lives in
:mod:`markmuse_spark.queries` — exactly 50 exported entries (the driver's
CORRECTNESS artifact budget; round 3's 53 got only 50 checked), every one
with oracle SQL (plain SQL where expressible, otherwise a ``read_parquet``
SELECT over a golden fixture minted by an independent pure-Python oracle).
Three redundant forms live in ``EXTRA_QUERIES`` and are pytest-oracled.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract Markdown from a mixed HTML/PDF corpus + the
    sf0.001 documents table, via the skew-aware pipeline operator."""
    from markmuse_spark.operators.extract import extract_markdown
    from markmuse_spark.plans.pipeline import salted_repartition
    from markmuse_spark.sources import corpus

    pages = corpus.pages_dataframe(spark, 300, seed=42, partitions=8)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_pages = docs.select(
        F.concat(F.lit("https://docs.example/sf/doc-"), F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><article><h1>Document "),
                F.col("doc_id"),
                F.lit("</h1><p>"),
                F.col("text"),
                F.lit("</p></article></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )

    from markmuse_spark.plans.cache import tracked_persist

    # persisted (round-8): the lang projection and the extraction join
    # both read the generated pages frame through an opaque mapInPandas
    # generator — without the persist the corpus writer runs twice
    all_pages = tracked_persist(pages.unionByName(doc_pages))
    lang_of = all_pages.select("url", "lang")
    extracted = extract_markdown(
        salted_repartition(all_pages, spark.sparkContext.defaultParallelism)
    )
    return (
        extracted.join(lang_of, "url")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
            F.sum("n_pages").alias("total_pages"),
            F.sum("n_images").alias("total_images"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from markmuse_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from markmuse_spark.queries import ORACLE

    return dict(ORACLE)
