"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference tracks per-task progress state across a task's lifetime
(``clients/celery/base_tasks.py:71-108``: PROGRESS meta accumulating over
updates).  The streaming analog: per-key running extraction statistics that
survive across micro-batches — implemented with Spark's arbitrary stateful
processing, state kept as a compact tuple per key, updates vectorized over
the batch's pandas frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = (
    "lang string, total_docs long, total_bytes long, batches_seen int"
)
STATE_DDL = "total_docs long, total_bytes long, batches_seen int"


def running_lang_stats(pages_stream: DataFrame) -> DataFrame:
    """Per-language running totals over a stream of pages.

    Each micro-batch updates the persistent per-key state and emits the
    new running totals — the PROGRESS-update pattern, exactly-once per
    batch via the streaming checkpoint.
    """

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        docs, nbytes, batches = (
            state.get if state.exists else (0, 0, 0)
        )
        for pdf in pdf_iter:
            docs += len(pdf)
            nbytes += int(pdf["html"].map(len).sum())
        batches += 1
        state.update((docs, nbytes, batches))
        yield pd.DataFrame(
            [
                {
                    "lang": key[0],
                    "total_docs": docs,
                    "total_bytes": nbytes,
                    "batches_seen": batches,
                }
            ]
        )

    return (
        pages_stream.select("lang", "html")
        .groupBy("lang")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
