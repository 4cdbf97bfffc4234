"""Scaling-run worker: extraction passes at a fixed parallelism.

Invoked by ``bench.py`` via ``spark-submit --py-files <pkg.zip>`` (the
submission path the north rule mandates), once per cluster-size stand-in
(``local[N]`` and ``local[4N]`` pinned to disjoint core sets).  Reads the
shared bench corpus, runs the salted size-aware extraction ``--passes``
times after one warm-up, forcing full materialization with an aggregate
(no output IO so the measurement is compute + shuffle).  Prints one JSON
line::

    {"cores": .., "n_docs": .., "passes": [{"elapsed_sec": ..,
     "docs_per_sec": .., "steal_pct": ..}, ...],
     "docs_per_sec": <median over passes>, "best_docs_per_sec": ..}

``steal_pct`` is hypervisor steal over each pass window from
``/proc/stat`` (machine-wide, all vcpus) — the sandbox VM shows bursty
10-35% steal, and the per-pass numbers let the harness prove which
windows were clean.  The median (not max) over equal pass counts is the
comparison statistic: the expected maximum of a noisy sample grows with
sample count, medians do not.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _cpu_stat() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from the aggregate /proc/stat line."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), (vals[7] if len(vals) > 7 else 0)
    except OSError:  # non-Linux fallback: no steal evidence
        return 0, 0


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--passes", type=int, default=1,
                    help="measured passes after the warm-up")
    ap.add_argument("--shuffle", action="store_true",
                    help="force the salted repartition ahead of extraction")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from markmuse_spark.operators.extract import extract_markdown
    from markmuse_spark.plans.pipeline import salted_repartition

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"markmuse-bench-{args.cores}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(args.cores * 4))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # batch sizes tuned on 3 KB-median payloads: small batches (512)
        # cost ~35% throughput in JVM-side batch bookkeeping; 2048/4096
        # keeps batch *bytes* bounded (~6-12 MB) while amortizing overhead
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.parquet.columnarReaderBatchSize", "4096")
        # byte-range splits are the size-aware partitioning: equal-byte
        # scan tasks load-balance a byte-proportional kernel without an
        # extra shuffle of the full payload (see plans.pipeline docstring)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(args.input)

    def job(df):
        return extract_markdown(
            salted_repartition(df, args.cores) if args.shuffle else df
        )

    # warm-up: one FULL excluded pass. A 5%-slice warm-up was measured
    # insufficient — the first full pass still ran 2x slower (cold page
    # cache for most row groups + incremental JIT), which depressed the
    # median; a full pass removes exactly the one-time costs a long-running
    # production job amortizes to zero, and nothing else
    job(pages).agg(F.count("*")).collect()

    passes = []
    n_docs = n_errors = sum_chars = 0
    for _ in range(max(1, args.passes)):
        tot0, st0 = _cpu_stat()
        t0 = time.time()
        agg = job(pages).agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("chars"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("errs"),
        ).first()
        elapsed = time.time() - t0
        tot1, st1 = _cpu_stat()
        steal_pct = (
            round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 2)
            if tot1 > tot0
            else None
        )
        n_docs, n_errors, sum_chars = agg["n"], agg["errs"], int(agg["chars"])
        passes.append(
            {
                "elapsed_sec": round(elapsed, 3),
                "docs_per_sec": round(n_docs / elapsed, 1),
                "steal_pct": steal_pct,
            }
        )

    rates = [p["docs_per_sec"] for p in passes]
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_docs": n_docs,
                "n_errors": n_errors,
                "sum_chars": sum_chars,
                "passes": passes,
                "docs_per_sec": round(_median(rates), 1),
                "best_docs_per_sec": max(rates),
                "elapsed_sec": min(p["elapsed_sec"] for p in passes),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
