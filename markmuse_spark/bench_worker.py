"""Scaling-run worker: one extraction job at a fixed parallelism.

Invoked by ``bench.py`` via ``spark-submit --py-files <pkg.zip>`` (the
submission path the north rule mandates), once per cluster-size stand-in
(``local[8]`` = N executors, ``local[32]`` = 4N).  Reads the shared bench
corpus, runs the salted size-aware extraction, forces full materialization
with an aggregate (no output IO so the measurement is compute + shuffle),
prints one JSON line ``{"elapsed_sec": ..., "n_docs": ..., "docs_per_sec":
...}`` on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cores", type=int, required=True)
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

    # warm-up on a ~5% slice spread across all splits: spawns every Python
    # worker, JIT-compiles the codegen'd scan, touches all input files —
    # one-time costs a long-running production job amortizes to zero
    warm = pages.filter(F.pmod(F.xxhash64("url"), F.lit(20)) == 0)
    job(warm).agg(F.count("*")).collect()

    t0 = time.time()
    agg = job(pages).agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("errs"),
    ).first()
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "elapsed_sec": round(elapsed, 3),
                "n_docs": agg["n"],
                "n_errors": agg["errs"],
                "sum_chars": int(agg["chars"]),
                "docs_per_sec": round(agg["n"] / elapsed, 1),
                "cores": args.cores,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
