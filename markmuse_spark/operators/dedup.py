"""Deduplication operators for the training-data pipeline.

Four families, all DataFrame-native where possible (JVM-side expressions,
no Python in the hot path except the bit-twiddling SimHash reducer which is
a vectorized numpy pandas-UDF):

* :func:`exact_duplicates` — hash-groupBy on normalized text
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via an inverted-index
  self-join (shuffle on shingle); the DuckDB-oracled ground truth
* :func:`minhash_lsh_pairs` — MinHash signatures (k xxhash64 permutations,
  computed as JVM array expressions) -> banded LSH candidate generation ->
  exact-Jaccard verification of candidates only.  The scale path: at 10^12
  docs the candidate join shuffles signatures (KBs/doc), never text.
* :func:`simhash` / :func:`simhash_near_pairs` — 64-bit SimHash with
  banded Hamming-distance candidate generation

Scale notes: shingle->doc lists are the classic skew source (stopword-only
shingles appear everywhere); ``max_df`` drops shingles occurring in more
than a fraction of documents before the join — the standard inverted-index
frequency cap.  All hashing is ``xxhash64`` (Spark-native, deterministic
across executors/runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_expr(text_col: str = "text"):
    """Lowercased whitespace tokens, empties removed (shared definition)."""
    return F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")


def shingles_expr(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles as an array column (JVM-side)."""
    t = tokens_expr(text_col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def normalized_fingerprint(text_col: str = "text"):
    """C-style document fingerprint: md5 of lower/whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: fingerprint groups (hash-groupBy; map-side combine)."""
    return (
        docs.select(F.col(id_col), normalized_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def _shingled(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), shingles_expr(text_col, n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    ``max_df``: optional frequency cap — shingles present in more than
    ``max_df`` documents are dropped before the join (skew control at
    scale; changes semantics, so default off and the oracle matches).
    """
    sh = _shingled(docs, id_col, text_col, n)
    # carry the per-doc shingle count through the explode: the set size is
    # constant within each (doc_a, doc_b) group, so first() recovers it and
    # no post-aggregation join with a sizes table is needed (one scan, one
    # shuffle on shingle, one shuffle on the pair key)
    inv = sh.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    if max_df is not None:
        hot = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        inv = inv.join(F.broadcast(hot), "shingle", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("n_inter"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
    )
    # threshold the UNROUNDED value (the DuckDB oracle does the same);
    # rounding is presentation-only on the projected column — filtering on
    # a rounded value would keep/drop boundary pairs differently per engine
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        pairs.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """MinHash signatures as ``array<long>`` (all JVM expressions).

    Each shingle string is hashed to a long ONCE (``xxhash64(shingle)``),
    then the k permutations rehash that 8-byte long (``xxhash64(h, i)``)
    instead of re-hashing the full shingle string k times — ~2-3x cheaper
    at equal quality."""
    sh = _shingled(docs, id_col, text_col, n)
    hashed = sh.select(
        "doc_id",
        F.transform(F.col("shingles"), lambda s: F.xxhash64(s)).alias("hs"),
    )

    def _perm(i: int):
        # NB: the lambda must take exactly one parameter — a two-parameter
        # lambda is interpreted by Spark as (element, index) and the index
        # would silently replace the permutation seed
        return F.array_min(
            F.transform(F.col("hs"), lambda h: F.xxhash64(h, F.lit(i)))
        )

    sig = F.array(*[_perm(i) for i in range(num_perm)])
    return hashed.select("doc_id", sig.alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified with exact Jaccard.

    rows/band = num_perm/bands; candidate iff any band hash collides.
    The verification joins back to the shingle arrays so the reported
    ``jaccard`` is exact (only over candidates — at 10^12 docs this is the
    whole point: pairwise work collapses to per-bucket work).
    """
    rows = num_perm // bands
    sigs = minhash_signature(docs, id_col, text_col, n, num_perm)
    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",", *[F.col("signature")[b * rows + r].cast("string") for r in range(rows)]
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        "doc_id", F.posexplode(band_arr).alias("band_id", "band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = _shingled(docs, id_col, text_col, n)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union  # threshold unrounded; round only the projection
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def md5_long_expr(col):
    """64-bit signed feature hash from md5 (first 8 bytes, big-endian) as a
    JVM expression.  Chosen over ``xxhash64`` for SimHash because md5 is
    reproducible in every engine (hashlib, DuckDB, Spark), which makes the
    banded SimHash output independently oracle-able
    (:mod:`markmuse_spark.golden.query_fixtures`); ~2x slower per feature —
    swap back to ``xxhash64`` at scale when cross-engine parity is not
    needed."""
    u = F.conv(F.substring(F.md5(col), 1, 16), 16, 10).cast("decimal(20,0)")
    two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    return F.when(u >= two63, u - two64).otherwise(u).cast("long")


def near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    exact: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """User-facing near-dup pair API.  DEFAULTS TO THE LSH PATH
    (:func:`minhash_lsh_pairs`): banded candidates, exact-Jaccard verify —
    the only shape that survives 10^12 documents.  ``exact=True`` switches
    to the inverted-index self-join (:func:`ngram_jaccard_pairs`), the
    ground-truth/oracle form; use it only at small scale or with ``max_df``
    set (unbounded, every stopword shingle is a hot join key)."""
    if exact:
        return ngram_jaccard_pairs(
            docs, id_col, text_col, n, threshold, max_df=max_df
        )
    return minhash_lsh_pairs(docs, id_col, text_col, n, threshold=threshold)


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """64-bit SimHash over word n-gram shingle features: feature hashes
    JVM-side (md5-derived, see :func:`md5_long_expr`), bit-vote reduction
    as a vectorized numpy pandas-UDF (the only Python step).  Shingle
    features (not unigrams) keep the feature space large enough that
    near-identical documents land within a few bits even over small
    vocabularies."""
    import numpy as np
    import pandas as pd

    def _simhash_from_hashes(hashes):
        out = np.empty(len(hashes), dtype=np.int64)
        for i, arr in enumerate(hashes):
            if arr is None or len(arr) == 0:
                out[i] = 0
                continue
            h = np.asarray(arr, dtype=np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = bits.sum(axis=0) * 2 - len(h)
            sig = np.uint64(0)
            for bit in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    # real-object annotations (module uses postponed annotations, which
    # pandas_udf's signature inference can't resolve from strings)
    _simhash_from_hashes.__annotations__ = {"hashes": pd.Series, "return": pd.Series}
    _simhash_from_hashes = F.pandas_udf(_simhash_from_hashes, "long")

    token_hashes = F.transform(shingles_expr(text_col, n), lambda t: md5_long_expr(t))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _simhash_from_hashes(token_hashes).alias("simhash"),
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded: with 8 x 8-bit
    bands, any pair within Hamming<=7 shares at least one exact band
    (pigeonhole) — candidates via band equi-join, verified exactly."""
    sig = simhash(docs, id_col, text_col)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * 8).bitwiseAND(F.lit(0xFF))
                    for b in range(8)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
