"""Spark extraction operator: ``pages`` DataFrame -> ``extracted`` DataFrame.

The one operator the reference has that Spark lacks (SURVEY §2 A5): the
OCR/layout stage, rebuilt as a vectorized ``mapInPandas`` over the binary
payload column.  Everything around it (scan, projection, shuffle, write)
stays declarative so Catalyst prunes columns and pushes filters into the
parquet scan — the operator itself selects only ``(url, html)``.

Plan shape (verified in tests via ``explain``): scan -> exchange (salted,
size-aware; see plans.pipeline) -> ArrowEvalPython/mapInPandas -> sink.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from markmuse_spark.kernel.extract import extract_batch

RESULT_DDL = (
    "url string, markdown string, extracted_text string, n_pages int, "
    "n_images int, n_chars long, error string, partition_id int"
)


def extract_markdown(pages: DataFrame, url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """Map the extraction kernel over (url, payload) with per-row error
    capture (A19 analog: one bad document never kills the job) and the
    executor partition id recorded for the lineage sidecar (A20 analog)."""
    import pandas as pd  # deferred: executors import inside the UDF too

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            rows = extract_batch(pdf[url_col].tolist(), pdf[payload_col].tolist())
            out = pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "markdown",
                    "extracted_text",
                    "n_pages",
                    "n_images",
                    "n_chars",
                    "error",
                ],
            )
            out["partition_id"] = pid
            yield out

    return pages.select(url_col, payload_col).mapInPandas(run, RESULT_DDL)
