#!/usr/bin/env python
"""Round-8 optimization harness (bench.py is FROZEN for measurement).

Times individual registry queries with the same methodology as bench.py's
headline sweeps (cold cache_scope + collect, min over N passes at
``local[$SPARK_GRAFT_CPUS]`` over ``$SPARK_GRAFT_SF_DIR``) and optionally
dumps ``explain("formatted")`` plans to ``plans/r08/``.

Usage::

    python bench_extra.py q1_pricing_summary d_minhash_lsh   # time those
    python bench_extra.py --all                              # all headline
    python bench_extra.py --plans before q1_pricing_summary  # dump plans
    python bench_extra.py --noop d_minhash_lsh               # noop sink
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary", "q3_top_orders", "q5_regional_revenue",
    "w_topk_per_group", "a13_ordered_concat", "b5_time_window",
    "a6_explode_flatten", "d_exact_dedup", "d_minhash_lsh",
    "d_simhash_pairs", "s_cosine_topk", "s_embedding_near_pairs_lsh",
    "t_quality_score", "t_lang_id", "t_train_split", "x_extract_enhanced",
    "p_corpus_curation",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    plans_tag = None
    if "--plans" in flags:
        plans_tag = args.pop(0)  # "before" | "after"
    names = HEADLINE if "--all" in flags else args
    passes = int(os.environ.get("BENCH_EXTRA_PASSES", "3"))
    use_noop = "--noop" in flags

    from markmuse_spark.plans.cache import cache_scope
    from markmuse_spark.queries import EXTRA_QUERIES, QUERIES
    from markmuse_spark.session import get_spark

    Q = {**QUERIES, **EXTRA_QUERIES}
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="markmuse-bench-extra",
        shuffle_partitions=CPUS,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    # same warm-up as bench.py: JVM/codegen/parquet-path init
    Q["b1_point_lookup"](spark, SF_DIR).collect()
    Q["b8_flag_filter"](spark, SF_DIR).collect()

    if plans_tag:
        outdir = os.path.join(REPO, "plans", "r08")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            with cache_scope():
                df = Q[name](spark, SF_DIR)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            path = os.path.join(outdir, f"{name}_{plans_tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print("wrote", path)
        spark.stop()
        return

    out: dict[str, list[float]] = {}
    for name in names:
        fn = Q[name]
        samples = []
        for _ in range(passes):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            with cache_scope():
                df = fn(spark, SF_DIR)
                if use_noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(name, samples, "min", min(samples), flush=True)
    print(json.dumps({k: min(v) for k, v in out.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
