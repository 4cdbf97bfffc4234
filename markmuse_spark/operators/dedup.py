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
frequency cap.

Hashing: shingle base hashes are ``xxhash64`` (JVM, deterministic across
executors/runs); MinHash permutations are seeded multiply-add bijections
over Z_2^64 in vectorized numpy; SimHash feature hashes are md5-derived
(hashlib == DuckDB == Spark, so the output is independently oracle-able).

A round-2 measurement note that shapes this module: Spark higher-order
-function expressions (transform/aggregate/filter lambdas) are INTERPRETED
— never whole-stage-codegen'd — so shingling and per-permutation array
math as JVM expressions cost milliseconds per document.  The hot paths
here therefore run as Arrow-batched pandas UDFs (3-8x faster measured),
while joins, grouping, banding keys, and verification set-intersections
stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# safe at module level: similarity's own dedup import is function-local
from markmuse_spark.operators.similarity import (
    DEFAULT_WARN_BUCKET_SIZE,
    _drop_oversized_buckets,
    _observe_oversized_buckets,
)


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


def _default_parallelism(spark) -> int:
    """Target UDF width, Spark-Connect-safe.  ``sparkContext`` raises
    ``PySparkAttributeError`` under Connect (round-7 review finding: the
    unguarded access crashed plan builds before the pure-Python file
    probe could even run); fall back to the shuffle-partition conf —
    the session's own statement of how wide an exchange should be."""
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:
        try:
            return max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
        except Exception:
            return 200  # Spark's shuffle-partition default


#: bytes of UDF input one task should own before extra width stops
#: paying (round-8 measurement: the sf0.1 shingle UDF's whole input is
#: ~1.5 MB / ~0.12 s of single-core work, and the blanket
#: default-parallelism repartition cost ~0.9 s of task-dispatch/Arrow
#: overhead across 32 near-empty partitions — width 4-8 was optimal).
#: Scale-adaptive by construction: width grows linearly with input
#: bytes until it hits the cluster's parallelism, and genuinely wide
#: inputs never reach the repartition at all (the provably-wide
#: early-out).  Env-tunable for hosts whose per-task overhead differs.
_UDF_SPLIT_BYTES = int(
    __import__("os").environ.get("MARKMUSE_UDF_SPLIT_BYTES", str(256 * 1024))
)


def _parallelize_for_udf(df: DataFrame, width: "int | None" = None) -> DataFrame:
    """At least default-parallelism partitions before an expensive Arrow
    UDF.  ``width``: explicit caller override (round 8) — frames with no
    file provenance (persisted intermediates, generated corpora) cannot
    be size-estimated here, and the blanket default-parallelism fan-out
    costs real dispatch overhead on small frames; callers that KNOW
    their frame's scale pass the width they mean.  A small parquet input arrives as FEW scan partitions
    (``files.maxPartitionBytes`` yields one partition per ~128 MB), and
    a narrow UDF stage inherits that — measured at sf0.1: the shingle
    UDF ran on ONE core of 32 and dominated the whole minhash query
    (5.1 s of 6.1 s).  Round-robin repartition of the slim (id, text)
    projection costs one small shuffle and buys full-width UDF
    execution; it is a NO-OP whenever the source is already at least
    as wide as the cluster, so at 10^12 docs (thousands of files) no
    extra shuffle ever happens.

    The scan width is estimated WITHOUT ``df.rdd`` (round-5 wart: the
    RDD probe converted the whole logical plan to RDD lineage on every
    plan build): ``df.inputFiles()`` resolves file-source scans from the
    logical plan alone, and the scan partition count is then REPLICATED
    from Spark's own packing formula (``FilePartition.maxSplitBytes``:
    per-file cost = size + ``files.openCostInBytes``, split size =
    ``min(maxPartitionBytes, max(openCost, totalCost/parallelism))``).
    Since packing charges every file at least ``openCost``, any scan of
    ``>= maxPartitionBytes/openCost * target`` files (32x target at the
    defaults) is provably wide — no size probes; below that bound the
    per-file size probes run pure-Python (``os.stat`` for ``file:``
    URIs — Spark-Connect-safe; py4j Hadoop bridge only for remote
    schemes when available), capped at 4x parallelism with the tail
    extrapolated from the probed mean.  A frame
    with no file provenance at all (``createDataFrame``, in-memory test
    frames) just takes the repartition — a no-op-cost shuffle of a
    small frame."""
    spark = df.sparkSession
    target = _default_parallelism(spark)
    if width is not None:
        return df.repartition(min(width, target))
    try:
        files = df.inputFiles()
    except Exception:  # exotic plans (pure streaming sources): be wide
        return df.repartition(target)
    if not files:
        return df.repartition(target)
    from markmuse_spark.operators.similarity import _parse_byte_conf

    max_split = max(1, _parse_byte_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    ))
    open_cost = max(1, _parse_byte_conf(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    ))
    # every file costs >= open_cost, and a split never exceeds max_split:
    # n_files * open_cost / max_split >= target  =>  provably wide
    if len(files) * open_cost >= target * max_split:
        return df
    # bounded size probe (ADVICE round 6: the per-file status calls are
    # serial driver RPCs on remote stores — cap them at 4x parallelism and
    # extrapolate the tail from the probed mean; the provably-wide
    # early-out above already bounds this branch at 32x-target files)
    # strided slice, not the listing head (ADVICE r7): ordered listings
    # whose leading files are systematically small/large would skew the
    # extrapolated mean; a spread sample reflects the whole listing
    n_probe = max(1, 4 * target)
    probe = files[:: max(1, len(files) // n_probe)][:n_probe]
    sizes = _probe_file_sizes(probe, spark)
    if sizes is None:
        # no pure-Python handler for the scheme and no py4j bridge
        # (Spark Connect): only sub-provably-wide inputs reach here, and
        # the round-robin is a cheap reshuffle of a small-by-construction
        # frame — prefer full UDF width over a maybe-narrow stage
        return df.repartition(target)
    total_bytes = sum(sizes)
    if len(files) > len(probe):  # extrapolate the unprobed tail
        total_bytes = total_bytes * len(files) // len(probe)
    total_cost = total_bytes + open_cost * len(files)
    split = min(max_split, max(open_cost, total_cost // max(1, target)))
    est_partitions = -(-total_cost // split)
    if est_partitions >= target:
        return df
    # sub-cluster-width scan: repartition, but SIZE-AWARE (round 8,
    # guide §2) — one task per ``_UDF_SPLIT_BYTES`` of input rather than
    # a blanket ``target``: a 1.5 MB frame fanned out to 32 near-empty
    # partitions paid ~0.9 s of dispatch/Arrow overhead for ~0.12 s of
    # UDF work.  Width still reaches ``target`` as soon as the input is
    # big enough to keep every core busy, so nothing changes at scale.
    width = min(target, max(1, -(-total_bytes // _UDF_SPLIT_BYTES)))
    # the packing formula over-counts open-cost-dominated (tiny-file)
    # scans — a single small file reads as 2 partitions when Spark packs
    # it into 1; bound the estimate by the file count (tiny files pack
    # ~1 per split) and the byte-split count (big files split by
    # maxPartitionBytes) before deciding the scan is already wide enough
    scan_width = min(
        est_partitions, max(len(files), int(total_bytes // max_split))
    )
    if width <= scan_width:
        return df  # the scan is already at least as wide as the data merits
    return df.repartition(width)


def _probe_file_sizes(files: list[str], spark) -> "list[int] | None":
    """File sizes for the scan-width estimate, pure Python first.

    ``file:`` URIs (and bare paths) go through ``os.stat`` — no JVM
    access, so the plan-build path works under Spark Connect, where
    ``spark._jvm`` does not exist (round-7 ask #5).  Other schemes fall
    back to the py4j Hadoop ``FileSystem`` bridge when it is available;
    when it is not, returns ``None`` and the caller repartitions.
    Unreadable files count as size 0 (same as the round-6 behavior)."""
    import os as _os
    from urllib.parse import unquote, urlparse

    sizes: list = []
    remote_idx: list[int] = []
    for i, f in enumerate(files):
        parsed = urlparse(f)
        if parsed.scheme in ("file", ""):
            path = unquote(parsed.path) if parsed.scheme == "file" else f
            try:
                sizes.append(_os.stat(path).st_size)
            except OSError:
                sizes.append(0)
        else:
            sizes.append(0)
            remote_idx.append(i)
    if remote_idx:
        try:  # classic py4j session only; Spark Connect has neither attr
            jvm = spark._jvm
            hconf = spark.sparkContext._jsc.hadoopConfiguration()
            HPath = jvm.org.apache.hadoop.fs.Path
        except Exception:
            return None
        for i in remote_idx:
            p = HPath(files[i])
            try:
                sizes[i] = int(p.getFileSystem(hconf).getFileStatus(p).getLen())
            except Exception:
                sizes[i] = 0
    return sizes


def _shingled(
    docs: DataFrame, id_col: str, text_col: str, n: int,
    udf_width: "int | None" = None,
) -> DataFrame:
    """(doc_id, shingles) with empty-shingle docs dropped.

    Shingling runs as an Arrow-batched pandas UDF, NOT the JVM
    higher-order-function expression (:func:`shingles_expr`): HOFs are
    interpreted (never codegen'd), and the measured cost of the expression
    form was ~2.3 ms/doc — 10-30x the Python loop below.  Semantics are
    identical to the JVM form (lower, split on ' ', drop empties, n-gram
    join with ' ', distinct preserving first occurrence), which the
    d_ngram_jaccard DuckDB oracle pins."""
    import pandas as pd

    def _sh(texts):
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            toks = [w for w in t.lower().split(" ") if w]
            if len(toks) < n:
                out.append([])
                continue
            out.append(
                list(
                    dict.fromkeys(
                        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                    )
                )
            )
        return pd.Series(out)

    _sh.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _sh = F.pandas_udf(_sh, "array<string>")

    slim = _parallelize_for_udf(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
        width=udf_width,
    )
    return slim.select(
        "doc_id", _sh(F.col("_t")).alias("shingles")
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
    seed: int = 12345,
) -> DataFrame:
    """MinHash signatures as ``array<long>``.

    Two-stage split chosen by measurement:

    * shingle -> 64-bit base hash stays JVM-side (ONE ``xxhash64`` pass per
      shingle array);
    * the ``num_perm`` permutations + minima run as a fully-vectorized
      numpy pandas-UDF: multiply-add permutations over Z_2^64 (odd seeded
      multipliers; uint64 wraparound, which ANSI-mode JVM arithmetic
      forbids) on a padded (batch, max_len, 1) x (1, 1, k) broadcast, min
      along the shingle axis under unsigned order.

    The earlier all-JVM form (64 ``transform``/``array_min`` expressions)
    was 20-30x slower: higher-order-function expressions are interpreted,
    not codegen'd, so 64 per-permutation array materializations dominated
    the whole dedup query (measured ~10 s for 5k docs; this form ~0.3 s).
    Multiply-add by a seeded odd constant is a bijection on Z_2^64, and a
    min under any fixed total order of a random bijection is a valid
    MinHash permutation family.
    """
    return _signature_from_shingled(
        _shingled(docs, id_col, text_col, n), num_perm, seed
    )


def _signature_from_shingled(
    sh: DataFrame, num_perm: int, seed: int
) -> DataFrame:
    """(doc_id, signature) from an already-shingled frame — split out so
    :func:`minhash_lsh_pairs` can reuse ONE shingle pass for both the
    signature and the exact-Jaccard verification stages."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    a = (rng.integers(0, 2 ** 62, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 2 ** 63, size=num_perm, dtype=np.uint64)
    pad = np.uint64(0xFFFFFFFFFFFFFFFF)

    def _minhash(hs_col):
        lens = hs_col.map(len).to_numpy()
        batch = len(lens)
        width = max(1, int(lens.max()) if batch else 1)
        mat = np.full((batch, width), pad, dtype=np.uint64)
        for i, arr in enumerate(hs_col):
            if len(arr):
                mat[i, : len(arr)] = np.asarray(arr, dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            perms = mat[:, :, None] * a[None, None, :] + b[None, None, :]
        # padded slots must never win the min; mask by LENGTH, not by the
        # pad value, so a genuine hash equal to 2^64-1 is not masked out
        pad_mask = np.arange(width)[None, :] >= lens[:, None]
        perms[pad_mask] = pad
        sig = perms.min(axis=1).view(np.int64)
        return pd.Series(list(sig))

    _minhash.__annotations__ = {"hs_col": pd.Series, "return": pd.Series}
    _minhash = F.pandas_udf(_minhash, "array<long>")

    hashed = sh.select(
        "doc_id",
        F.transform(F.col("shingles"), lambda s: F.xxhash64(s)).alias("hs"),
    )
    return hashed.select("doc_id", _minhash(F.col("hs")).alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_band_size: int | None = None,
    warn_band_size: int | None = DEFAULT_WARN_BUCKET_SIZE,
    udf_width: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified with exact Jaccard.

    ``udf_width``: explicit shingle-UDF parallelism for inputs whose
    size :func:`_parallelize_for_udf` cannot estimate (no file
    provenance — persisted intermediates, generated corpora); default
    keeps the size-aware rule.

    rows/band = num_perm/bands; candidate iff any band hash collides.
    The verification joins back to the shingle arrays so the reported
    ``jaccard`` is exact (only over candidates — at 10^12 docs this is the
    whole point: pairwise work collapses to per-bucket work).

    ``max_band_size``: degenerate-bucket guard (the banded analog of
    ``max_df``, same shape as the hyperplane miner's
    ``max_bucket_size``).  A boilerplate-identical cluster of m docs
    shares every band hash and yields O(m^2) candidate rows PER BAND
    with nothing bounding it; with the cap set, (band_id, band_hash)
    groups larger than the cap are counted over a persisted band frame,
    dropped via broadcast anti-join, and logged.  Default off (exported
    oracles run uncapped); pairs all of whose shared bands are oversized
    are lost — for a true duplicate CLUSTER that loss is usually
    acceptable (exact dedup catches identical docs first), which is why
    the cap composes with :func:`exact_duplicates` upstream.

    ``warn_band_size``: DEFAULT-ON warn-only observability (one cheap
    aggregate over the persisted band frame; logs any (band_id,
    band_hash) group over the soft threshold, drops nothing — the
    exported oracles are byte-identical with it on).  ``None`` disables.

    The shingled frame is computed ONCE and persisted (memory-with-disk
    spill): three plan branches read it — the signature stage and both
    sides of the verification join — and without the persist Spark
    recomputes the tokenize/shingle UDF per branch (no common-subplan
    elimination across self-joins; measured as the dominant cost of the
    whole query in round 2).  Carrying the shingle arrays *through* the
    banded candidate join instead would avoid the cache but shuffle
    ~``bands``x the shingle bytes per doc — the wrong trade at 10^12 docs,
    where candidates shuffle signatures (KBs), never shingle sets.  At
    production scale the shingled/signature frame would be staged to a
    table once and read by both stages; the cache is the single-session
    equivalent.  The persist is TRACKED: one-shot jobs leave it to LRU
    eviction (CacheManager also dedupes identical re-built plans), and a
    long-lived session wraps calls in
    :func:`markmuse_spark.plans.cache.cache_scope` to unpersist after
    consuming the result.
    """
    from markmuse_spark.plans.cache import tracked_persist

    rows = num_perm // bands
    sh = tracked_persist(_shingled(docs, id_col, text_col, n, udf_width=udf_width))
    sigs = _signature_from_shingled(sh, num_perm, seed=12345)
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
    if warn_band_size is not None or max_band_size is not None:
        # the drop guard's size aggregate (and its anti-join probe) is an
        # extra reader of the band frame, so it gets its own persist —
        # which ALSO means the signature UDF runs once total instead of
        # once per self-join side below.  (The persist mark itself is
        # lazy; since round 7 the warn path adds no job either, so
        # building this plan triggers no Spark work at all.)
        banded = tracked_persist(banded)
    if max_band_size is not None:
        banded = _drop_oversized_buckets(
            banded,
            ["band_id", "band_hash"],
            max_band_size,
            "minhash_lsh_pairs",
            param_name="max_band_size",
        )
    # warn-only observability rides ONE side of the self-join (window
    # over the band keys + CollectMetrics — zero extra jobs/exchanges;
    # the warn fires on the caller's own first action): at 100 TB a
    # boilerplate-identical cluster must be announced, not discovered
    # from a melted shuffle stage.  No rows dropped, oracles unchanged.
    a_side = banded
    if warn_band_size is not None:
        a_side = _observe_oversized_buckets(
            banded, ["band_id", "band_hash"], warn_band_size,
            "minhash_lsh_pairs",
        )
    a = a_side.alias("a")
    b = banded.alias("b")
    # candidate dedup is folded into the exchange that feeds the verify
    # join: repartitioning on doc_a alone still satisfies the duplicate-
    # elimination aggregate's clustering requirement (equal (doc_a,doc_b)
    # rows co-locate under any hash of doc_a), and the aggregate's output
    # partitioning then ALSO satisfies the first verification join's
    # requirement — one exchange where `.distinct()` before the join cost
    # two (pair-key exchange + join-key exchange).  The trade: band-
    # collision duplicates (<= `bands` rows per pair, 16 bytes each) ride
    # the shuffle instead of being combined map-side — cheaper than a
    # whole extra exchange of the deduped pair set at every scale.
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .repartition(F.col("doc_a"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
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


def line_dedup(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "markdown",
) -> DataFrame:
    """C4-style GLOBAL line deduplication: every distinct non-blank line
    keeps exactly ONE occurrence corpus-wide — the first in ``(id, line
    position)`` order — and later occurrences are removed (C4 removed
    repeated lines this way to strip cross-document boilerplate before
    training).  Blank lines are structural, never deduplicated.

    Returns ``(id, text_clean, n_kept, n_removed)`` with ``text_clean``
    the surviving lines re-joined in original order.

    Scale shape: the keeper per line comes from ``groupBy(line).agg(min(
    struct(id, pos)))`` — a hash aggregate with map-side combine, so a
    boilerplate line occurring in every one of 10^12 documents partially
    aggregates on each executor instead of hot-spotting one reducer (the
    window-function formulation, ``row_number() over (partition by
    line)``, would shuffle every occurrence of the hottest line to a
    single partition — exactly the skew this avoids).  The join back on
    ``line`` is a plain equi-join AQE's skew handling covers; at extreme
    corpus sizes join on ``xxhash64(line)`` instead to shrink shuffle
    bytes (not done here: the text key keeps the result independently
    oracle-able, and 64-bit birthday collisions at 10^12 lines are small
    but not zero).

    ``docs`` is read by two plan branches (the line explode and the
    keeper aggregate): pass a materialized table, or persist a derived
    input first — Spark does not share subplans across self-joins, so a
    derived input would otherwise recompute per branch.
    """
    # NULL text is treated as the empty document (one blank line): split
    # of NULL is NULL and posexplode(NULL) emits NOTHING, which would
    # silently drop the whole row from the output — a contract violation
    # for pipelines that count or join on the result
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("pos", "line"),
    )
    keepers = (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(
            F.min(
                F.struct(F.col("_id").alias("i"), F.col("pos").alias("p"))
            ).alias("first_at")
        )
    )
    marked = lines.join(keepers, "line", "left").withColumn(
        "keep",
        (F.col("line") == "")
        | (
            (F.col("first_at.i") == F.col("_id"))
            & (F.col("first_at.p") == F.col("pos"))
        ),
    )
    kept_struct = F.when(F.col("keep"), F.struct("pos", "line"))
    return (
        marked.groupBy("_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    # collect_list drops the nulls the when() leaves for
                    # removed lines; pos is unique per doc so the struct
                    # sort restores original order exactly
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
            ).alias("text_clean"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
        )
        .withColumnRenamed("_id", id_col)
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
    set (unbounded, every stopword shingle is a hot join key).

    ``max_df`` applies ONLY to the exact path (it caps the inverted
    index's hot shingles; the LSH path has no inverted index — its skew
    control is the banded signature join itself), so supplying it with
    ``exact=False`` raises rather than silently ignoring the cap."""
    if exact:
        return ngram_jaccard_pairs(
            docs, id_col, text_col, n, threshold, max_df=max_df
        )
    if max_df is not None:
        raise ValueError(
            "max_df is an inverted-index frequency cap; it has no effect "
            "on the LSH path — pass exact=True to use it"
        )
    return minhash_lsh_pairs(docs, id_col, text_col, n, threshold=threshold)


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """64-bit SimHash over word n-gram shingle features, one Arrow-batched
    UDF from text to signature: tokenize/shingle (same semantics the
    d_ngram_jaccard oracle pins), md5-derived 64-bit feature hashes
    (hashlib — byte-identical to :func:`md5_long_expr` and to the
    independent fixture oracle in golden/query_fixtures.py), vectorized
    numpy bit votes.  Docs with < n tokens get signature 0 (and therefore
    pair with each other — reference-free but fixture-pinned semantics).

    Single-UDF form chosen by measurement: the earlier JVM shingle +
    ``transform(md5->conv->decimal)`` expression chain ran interpreted
    (higher-order functions are never codegen'd) and cost ~6 ms/doc;
    this form is ~0.2 ms/doc.  Shingle features (not unigrams) keep the
    feature space large enough that near-identical documents land within
    a few bits even over small vocabularies.

    The per-shingle work is one ``md5(...).digest()`` C call (the
    irreducible parity floor — md5 is what hashlib, DuckDB and the
    fixture oracle all reproduce); everything downstream is vectorized
    per document: one ``np.frombuffer`` over the concatenated digests
    replaces per-shingle ``int.from_bytes``, and ``np.unpackbits`` +
    a single int32 row-sum replace the uint64 broadcast shift (measured
    7x faster than the shift for the bit matrix; ~17% off the whole
    UDF).  Full-batch ``reduceat``/``cumsum`` segment forms were
    measured SLOWER than this per-doc loop (0.7-1.4s vs 0.41s for 5k
    docs) and allocate O(batch_shingles x 64) — rejected."""
    import hashlib

    import numpy as np
    import pandas as pd

    md5 = hashlib.md5
    # unpackbits is MSB-first per byte, so column k of the bit matrix is
    # bit (63-k) of the big-endian 64-bit feature hash: pack the
    # signature back with DESCENDING weights to keep byte-identical
    # parity with the md5_long_expr / fixture-oracle bit convention
    w_desc = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)

    def _simhash(texts):
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = [w for w in t.lower().split(" ") if w]
            if len(toks) < n:
                continue
            sh = dict.fromkeys(
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            )
            buf = b"".join(md5(s.encode("utf-8")).digest() for s in sh)
            u8 = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)[:, :8]
            bits = np.unpackbits(u8, axis=1)
            votes = bits.sum(axis=0, dtype=np.int32) * 2 - len(sh)
            sig = ((votes > 0).astype(np.uint64) * w_desc).sum(dtype=np.uint64)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    _simhash.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _simhash = F.pandas_udf(_simhash, "long")

    slim = _parallelize_for_udf(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    )
    return slim.select("doc_id", _simhash(F.col("_t")).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded: with 8 x 8-bit
    bands, any pair within Hamming<=7 shares at least one exact band
    (pigeonhole) — candidates via band equi-join, verified exactly.

    The signature frame is persisted (tracked — see
    :mod:`markmuse_spark.plans.cache`): BOTH sides of the band self-join
    read it, and Spark shares no subplans across self-joins, so without
    the persist the simhash UDF runs twice over the corpus (measured
    ~0.7 s per extra pass at sf0.1 — the same double-compute minhash_lsh
    fixed in round 3)."""
    from markmuse_spark.plans.cache import tracked_persist

    sig = tracked_persist(simhash(docs, id_col, text_col))
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
