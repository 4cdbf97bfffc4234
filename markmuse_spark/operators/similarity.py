"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force cosine top-k against a query vector.
  All math is JVM-side (``zip_with`` + ``aggregate`` sequential double
  fold) so results are bit-stable and oracle-comparable.
* :func:`lsh_bucketed_topk` — the scale path: deterministic random-
  hyperplane signatures (seeded numpy planes broadcast to executors,
  vectorized matmul in a pandas UDF), candidates from the query's bucket
  within a Hamming radius, exact cosine re-rank of candidates only.
  At 10^12 vectors the bucket join touches a tiny candidate set instead
  of every row; brute force stays as the ground truth / small-side path.
* :func:`embedding_near_pairs` — all-pairs near-duplicate detection by
  cosine (embedding-space dedup), exact via self-join; at scale the same
  LSH bucketing bounds the pair space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    """Cosine similarity between two array<double> columns (JVM fold)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine against the vector with ``query_id``.

    The 1-row query side is broadcast; the scan side is one pass, no
    shuffle until the final top-k (which Spark executes as a partial
    per-partition top-k + single merge — TakeOrderedAndProject)."""
    # norms are per-vector quantities: compute them once on the scan side
    # (and once for the broadcast query row), never per pair
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("nrm", _norm(F.col("vec")))
    q = v.filter(F.col(id_col) == query_id).select(
        F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm")
    )
    return (
        v.join(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(
                _dot(F.col("vec"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm")), 4
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_signatures(
    vectors: DataFrame,
    n_tables: int = 8,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Multi-table random-hyperplane LSH signatures (``array<long>``, one
    bucket id per table).

    Planes are a seeded numpy ``(dim, n_tables*n_planes)`` matrix broadcast
    into the UDF closure; all signatures come from one vectorized matmul
    per Arrow batch — no per-row Python.  Multiple independent tables are
    the standard recall amplifier (OR over tables) when neighbor cosines
    are modest."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def _sig(vecs):
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, tables*planes)
        per_table = bits.reshape(len(mat), n_tables, n_planes) @ weights
        return pd.Series(list(per_table.astype(np.int64)))

    # real-object annotations: postponed (string) annotations defeat
    # pandas_udf signature inference
    _sig.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    _sig = F.pandas_udf(_sig, "array<long>")

    return vectors.select(
        F.col(id_col), F.col(vec_col), _sig(F.col(vec_col)).alias("buckets")
    )


def lsh_bucketed_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 8,
    hamming_radius: int = 1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: a vector is a candidate when, in ANY table, its
    bucket is within ``hamming_radius`` bits of the query's; candidates are
    re-ranked by exact cosine.

    This is the broadcast-query form (one query, scan-side filter).  The
    batch form at 10^12 vectors groups by ``(table, bucket)`` and joins
    queries to probe buckets — same signatures, different join shape."""
    sigs = lsh_signatures(vectors, n_tables, n_planes, seed, id_col, vec_col)
    q = sigs.filter(F.col(id_col) == query_id).select(
        F.col("buckets").alias("qbuckets"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    joined = sigs.join(F.broadcast(q)).filter(F.col(id_col) != query_id)
    any_table_close = F.exists(
        F.zip_with(
            F.col("buckets"),
            F.col("qbuckets"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)) <= hamming_radius,
        ),
        lambda x: x,
    )
    return (
        joined.filter(any_table_close)
        .select(
            F.col(id_col),
            F.round(
                cosine_expr(F.col(vec_col).cast("array<double>"), F.col("qvec")), 4
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_pairs(
    vectors: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-duplicates (embedding-space dedup)."""
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("nrm", _norm(F.col("vec")))  # per-vector, never per-pair
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("n_a")
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("n_b")
    )
    # threshold the UNROUNDED cosine (matching the oracle's WHERE clause);
    # round only the projected output column
    cos = _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cos >= threshold)
        .select("id_a", "id_b", F.round(cos, 4).alias("cosine"))
    )
