"""Independent pure-Python oracles -> golden parquet fixtures for the
registry queries whose semantics no SQL engine can express directly
(seeded-hash / seeded-RNG computations: SimHash bit votes, hyperplane-LSH
probing, md5-seeded feature vectors, the extraction kernel itself).

Each minting function re-derives the expected result FROM FIRST PRINCIPLES
(hashlib / numpy / the golden assembly oracle) without importing the Spark
operators under test, writes one parquet per query under
``fixtures/query_golden/``, and the query's ``oracle_sql()`` entry is then a
plain ``SELECT ... FROM read_parquet('<fixture>')`` the driver's DuckDB can
run — turning the former rows-only checks into full three-way
(rows+schema+hash) comparisons.

Freshness is enforced by ``tests/test_query_fixtures.py``: it re-mints every
fixture in-memory and asserts byte-equality with the committed parquet, so a
semantic change that forgets ``python -m markmuse_spark.golden.query_fixtures``
fails the suite.

Determinism inputs: ``/root/testdata/sf0.01`` (the driver's correctness
scale) and the seed-42 extraction corpus spec.
"""

from __future__ import annotations

import hashlib
import math
import os
from decimal import ROUND_HALF_UP, Decimal

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "query_golden",
)
SF_DIR = "/root/testdata/sf0.01"


def spark_round(x: float, scale: int = 4) -> float:
    """Replicate Spark's ``round(double, n)``: HALF_UP on the shortest
    decimal repr (BigDecimal.valueOf semantics).  Python's built-in round
    is HALF_EVEN — a boundary value would differ."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _documents(max_doc_id: int | None = None) -> list[dict]:
    import pyarrow.parquet as pq

    rows = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    if max_doc_id is not None:
        rows = [r for r in rows if r["doc_id"] < max_doc_id]
    return sorted(rows, key=lambda r: r["doc_id"])


# ---------------------------------------------------------------------
# x_extract_corpus: golden assembly oracle over the 200-row seed-42 corpus
# ---------------------------------------------------------------------

def mint_x_extract_corpus() -> tuple[list[dict], "object"]:
    import pyarrow as pa

    from markmuse_spark.golden import oracle
    from markmuse_spark.sources.corpus import _make_doc

    rows = []
    for i in range(200):
        url, _payload, expected, err = _make_doc(i, 42)
        if expected is None:  # hard error: nothing recoverable
            rows.append(
                {
                    "url": url,
                    # the query hashes coalesce(markdown, '')
                    "markdown_md5": hashlib.md5(b"").hexdigest(),
                    "n_pages": 0,
                    "n_images": 0,
                    "n_chars": 0,
                    "is_error": True,
                }
            )
            continue
        # corpus-v17 PARTIAL rows (err set, pages present): the salvaged
        # markdown ships WITH is_error=True — the kernel must recover
        # the intact pages AND report the damage, never all-or-nothing
        doc = oracle.assemble_document(url, expected)
        rows.append(
            {
                "url": url,
                "markdown_md5": hashlib.md5(
                    doc["markdown"].encode("utf-8")
                ).hexdigest(),
                "n_pages": len(expected),
                "n_images": len(doc["image_manifest"]),
                "n_chars": len(doc["markdown"]),
                "is_error": err is not None,
            }
        )
    rows.sort(key=lambda r: r["url"])
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("markdown_md5", pa.string()),
            ("n_pages", pa.int32()),
            ("n_images", pa.int32()),
            ("n_chars", pa.int64()),
            ("is_error", pa.bool_()),
        ]
    )
    return rows, schema


def mint_x_extract_corpus_2k() -> tuple[list[dict], "object"]:
    """Bench-scale flagship oracle (round-3 ask): the golden assembly
    oracle over a 2000-row seed-42 corpus, reduced to ONE aggregate row —
    counts, char/image sums, and a corpus-level checksum (md5 over the
    url-sorted ``url|md5`` lines) — so the Spark side must get every one
    of 2000 multi-partition assemblies byte-right to match."""
    import pyarrow as pa

    from markmuse_spark.golden import oracle
    from markmuse_spark.sources.corpus import _make_doc

    lines = []
    n_errors = sum_chars = sum_images = 0
    for i in range(2000):
        url, _payload, expected, err = _make_doc(i, 42)
        if err is not None:
            n_errors += 1  # hard AND v17-partial rows both set error
        if expected is None:  # hard error: nothing recoverable
            lines.append(f"{url}|{hashlib.md5(b'').hexdigest()}")
            continue
        doc = oracle.assemble_document(url, expected)
        sum_chars += len(doc["markdown"])
        sum_images += len(doc["image_manifest"])
        lines.append(
            f"{url}|{hashlib.md5(doc['markdown'].encode('utf-8')).hexdigest()}"
        )
    corpus_md5 = hashlib.md5("\n".join(sorted(lines)).encode("utf-8")).hexdigest()
    rows = [
        {
            "n_docs": 2000,
            "n_errors": n_errors,
            "sum_chars": sum_chars,
            "sum_images": sum_images,
            "corpus_md5": corpus_md5,
        }
    ]
    schema = pa.schema(
        [
            ("n_docs", pa.int64()),
            ("n_errors", pa.int64()),
            ("sum_chars", pa.int64()),
            ("sum_images", pa.int64()),
            ("corpus_md5", pa.string()),
        ]
    )
    return rows, schema


def mint_d_line_dedup() -> tuple[list[dict], "object"]:
    """Independent replica of C4-style global line dedup over the 200-doc
    golden markdown corpus: iterate documents in url order, keep the FIRST
    occurrence of every distinct non-blank line (position order within a
    document), always keep blank lines; report the cleaned text as an md5
    plus kept/removed counts per url."""
    import pyarrow as pa

    from markmuse_spark.golden import oracle
    from markmuse_spark.sources.corpus import _make_doc

    docs = []
    for i in range(200):
        url, _payload, expected, err = _make_doc(i, 42)
        if err is not None:
            continue  # the query filters error rows the same way
        docs.append((url, oracle.assemble_document(url, expected)["markdown"]))
    docs.sort(key=lambda d: d[0])

    seen: set[str] = set()
    rows = []
    for url, md in docs:
        kept_lines = []
        n_removed = 0
        for line in md.split("\n"):
            if line == "":
                kept_lines.append(line)
            elif line in seen:
                n_removed += 1
            else:
                seen.add(line)
                kept_lines.append(line)
        clean = "\n".join(kept_lines)
        rows.append(
            {
                "url": url,
                "clean_md5": hashlib.md5(clean.encode("utf-8")).hexdigest(),
                "n_kept": len(kept_lines),
                "n_removed": n_removed,
            }
        )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("clean_md5", pa.string()),
            ("n_kept", pa.int64()),
            ("n_removed", pa.int64()),
        ]
    )
    return rows, schema


def mint_x_extract_enhanced() -> tuple[list[dict], "object"]:
    """Enhanced-mode (A11) golden: the independent enhanced oracle over the
    expected page models, captions from the same deterministic fake the
    Spark-side ``deterministic_captions`` produces."""
    import pyarrow as pa

    from markmuse_spark.golden import oracle
    from markmuse_spark.sources.corpus import _make_doc

    rows = []
    for i in range(100):
        url, _payload, expected, err = _make_doc(i, 42)
        if expected is None:  # hard error: nothing recoverable
            rows.append(
                {
                    "url": url,
                    "markdown_md5": hashlib.md5(b"").hexdigest(),
                    "n_images": 0,
                    "n_enhanced": 0,
                    "n_chars": 0,
                    "is_error": True,
                }
            )
            continue
        # v17-partial rows: salvaged markdown + is_error=True (see
        # mint_x_extract_corpus)
        captions = {
            f"img-p1-{k}.png": "synthetic caption "
            + hashlib.md5(f"{url}|img-p1-{k}.png".encode()).hexdigest()[:12]
            for k in range(1, 5)
        }
        doc = oracle.assemble_document_enhanced(url, expected, captions)
        rows.append(
            {
                "url": url,
                "markdown_md5": hashlib.md5(
                    doc["markdown"].encode("utf-8")
                ).hexdigest(),
                "n_images": len(doc["image_manifest"]),
                "n_enhanced": doc["n_enhanced"],
                "n_chars": len(doc["markdown"]),
                "is_error": err is not None,
            }
        )
    rows.sort(key=lambda r: r["url"])
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("markdown_md5", pa.string()),
            ("n_images", pa.int32()),
            ("n_enhanced", pa.int32()),
            ("n_chars", pa.int64()),
            ("is_error", pa.bool_()),
        ]
    )
    return rows, schema


def mint_x_extract_images() -> tuple[list[dict], "object"]:
    """Images-table golden: the oracle's image-normalization path
    (``normalize_image`` — independent of the production kernel) over the
    expected page models; payloads reported as md5."""
    import pyarrow as pa

    from markmuse_spark.golden import oracle
    from markmuse_spark.sources.corpus import _make_doc

    rows = []
    for i in range(100):
        url, _payload, expected, err = _make_doc(i, 42)
        if err is not None:
            continue
        stem = oracle.output_stem(url)
        for page in sorted(expected, key=lambda p: p["page_idx"]):
            for img_idx, img in enumerate(page.get("images") or []):
                res = oracle.normalize_image(
                    page["page_idx"], img_idx, img.get("id"), img.get("image_base64")
                )
                if res is None:
                    continue
                img_id, safe, content_type, data = res
                rows.append(
                    {
                        "url": url,
                        "page_idx": page["page_idx"],
                        "img_idx": img_idx,
                        "img_id": img_id,
                        "safe_filename": safe,
                        "rel_path": f"{stem}_images/{safe}",
                        "content_type": content_type,
                        "n_bytes": len(data),
                        "payload_md5": hashlib.md5(data).hexdigest(),
                    }
                )
    rows.sort(key=lambda r: (r["url"], r["page_idx"], r["img_idx"]))
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("page_idx", pa.int32()),
            ("img_idx", pa.int32()),
            ("img_id", pa.string()),
            ("safe_filename", pa.string()),
            ("rel_path", pa.string()),
            ("content_type", pa.string()),
            ("n_bytes", pa.int64()),
            ("payload_md5", pa.string()),
        ]
    )
    return rows, schema


# ---------------------------------------------------------------------
# m_image_metadata: first-principles expectations for the synthetic PNGs
# ---------------------------------------------------------------------

def mint_m_image_metadata() -> tuple[list[dict], "object"]:
    """First-principles expectations for the synthetic 4-container mix
    (PNG / WEBP-VP8X / WAV / MP4 by ``doc_id % 4``): payloads rebuilt
    with struct/bytes arithmetic, dimensions and durations taken from
    the CONSTRUCTION math (never a parser), sha1 via hashlib."""
    import struct

    import pyarrow as pa

    magic_ihdr = bytes.fromhex("89504E470D0A1A0A0000000D49484452")
    rows = []
    for d in _documents(max_doc_id=100):
        did = int(d["doc_id"])
        w = did % 1920 + 1
        h = did % 1080 + 1
        body = d["text"].encode("utf-8")
        fmt, width, height, dur = None, None, None, None
        if did % 4 == 0:
            fmt, width, height = "png", w, h
            payload = (
                magic_ihdr + w.to_bytes(4, "big") + h.to_bytes(4, "big") + body
            )
        elif did % 4 == 1:
            fmt, width, height = "webp", w, h
            payload = (
                b"RIFF\x16\x00\x00\x00WEBPVP8X\x0a\x00\x00\x00\x00\x00\x00\x00"
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little")
                + body
            )
        elif did % 4 == 2:
            dsz = (did + 1) * 16
            fmt, dur = "wav", dsz * 1000 // 16000  # byte rate 16000
            payload = (
                b"RIFF" + struct.pack("<I", dsz + 36)
                + b"WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00"
                + b"\x40\x1f\x00\x00\x80\x3e\x00\x00\x02\x00\x10\x00data"
                + struct.pack("<I", dsz) + body
            )
        else:
            mdur = (did + 1) * 250
            fmt, dur = "mp4", mdur * 1000 // 1000  # timescale 1000
            payload = (
                b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00"
                b"\x00\x00\x00\x24moov\x00\x00\x00\x1cmvhd\x00\x00\x00\x00"
                b"\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x03\xe8"
                + struct.pack(">I", mdur) + body
            )
        rows.append(
            {
                "_id": str(did),
                "format": fmt,
                "width": width,
                "height": height,
                "duration_ms": dur,
                "n_bytes": len(payload),
                "sha1": hashlib.sha1(payload).hexdigest(),
            }
        )
    schema = pa.schema(
        [
            ("_id", pa.string()),
            ("format", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("duration_ms", pa.int64()),
            ("n_bytes", pa.int64()),
            ("sha1", pa.string()),
        ]
    )
    return rows, schema


# ---------------------------------------------------------------------
# m_image_features: expected REAL features computed from the SPEC PIXELS
# directly — an independent pure-Python implementation of the feature
# formulas (exact integer sums -> single float division) that never
# touches the engine's PNG decoder or numpy feature code, so a match
# pins the whole spec->encode->decode->stats chain
# ---------------------------------------------------------------------

def _replica_png_features(px) -> dict:
    """Independent re-derivation of the 16-float layout's oracled slots
    over a raw (H, W, C) uint8 matrix: width/height/channels, channel-0
    exact mean and std, first histogram-bin fraction."""
    h = len(px)
    w = len(px[0])
    ch = len(px[0][0])
    n = h * w
    lane0 = [int(px[y][x][0]) for y in range(h) for x in range(w)]
    s = sum(lane0)
    sq = sum(v * v for v in lane0)
    mean0 = s / n
    std0 = ((n * sq - s * s) / (n * n)) ** 0.5
    hist0 = sum(1 for v in lane0 if v < 52) / n
    return {
        "width": float(w), "height": float(h), "channels": float(ch),
        "mean_c0": mean0, "std_c0": std0, "hist0": hist0,
    }


def mint_m_image_features() -> tuple[list[dict], "object"]:
    import numpy as np
    import pyarrow as pa

    from markmuse_spark.sources.gif_writer import gif_pixel_spec
    from markmuse_spark.sources.png_writer import png_pixel_spec

    rows = []
    for d in _documents(max_doc_id=60):
        did = int(d["doc_id"])
        # doc_id % 5 == 2 rows are GIF (lossless, like PNG — so the
        # oracle still computes from the spec pixels, no codec run)
        spec = gif_pixel_spec if did % 5 == 2 else png_pixel_spec
        px = spec(did, d["text"]).tolist()  # plain ints from here
        stats = _replica_png_features(px)
        rows.append(
            {
                "doc_id": did,
                # the engine emits float32 features; replicate the cast
                # before the oracle-side rounding so both sides round
                # the identical double
                **{
                    k: spark_round(float(np.float32(v)))
                    for k, v in stats.items()
                },
                "dim": 16,
            }
        )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("width", pa.float64()),
            ("height", pa.float64()),
            ("channels", pa.float64()),
            ("mean_c0", pa.float64()),
            ("std_c0", pa.float64()),
            ("hist0", pa.float64()),
            ("dim", pa.int32()),
        ]
    )
    return rows, schema


# ---------------------------------------------------------------------
# SimHash: md5-based 64-bit feature hashes, bit votes, all-pairs Hamming
# (the Spark operator uses banded candidates; 8x8-bit bands provably cover
# every Hamming<=7 pair, so the all-pairs derivation here is equal output)
# ---------------------------------------------------------------------

def _shingles(text: str, n: int = 3) -> list[str]:
    toks = [t for t in text.lower().split(" ") if t]
    if len(toks) < n:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def md5_long_unsigned(s: str) -> int:
    """The engine's feature hash: first 8 md5 bytes, big-endian unsigned."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def simhash64(text: str) -> int:
    sh = _shingles(text)
    if not sh:
        return 0
    hs = [md5_long_unsigned(s) for s in sh]
    sig = 0
    half = len(hs)
    for b in range(64):
        ones = sum((h >> b) & 1 for h in hs)
        if 2 * ones > half:
            sig |= 1 << b
    return sig


def mint_d_simhash_pairs(max_hamming: int = 6) -> tuple[list[dict], "object"]:
    import pyarrow as pa

    docs = _documents()
    sigs = [(int(d["doc_id"]), simhash64(d["text"])) for d in docs]
    rows = []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            (ia, sa), (ib, sb) = sigs[i], sigs[j]
            ham = bin(sa ^ sb).count("1")
            if ham <= max_hamming:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                rows.append({"doc_a": a, "doc_b": b, "hamming": ham})
    rows.sort(key=lambda r: (r["doc_a"], r["doc_b"]))
    schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int32())]
    )
    return rows, schema


# ---------------------------------------------------------------------
# Hyperplane-LSH ANN: seeded planes, bucket signatures, Hamming-radius
# probe, exact left-fold cosine re-rank (replicates the documented spec,
# not the Spark code)
# ---------------------------------------------------------------------

def _embeddings():
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    ids = [int(v) for v in tbl["vec_id"].to_pylist()]
    vecs = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    return ids, vecs


def _fold_dot(a, b) -> float:
    """Strict left-to-right float64 fold — Spark's F.aggregate semantics
    (numpy's pairwise-summed dot can differ in the last ulp)."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _cosine(a, b) -> float:
    return _fold_dot(a, b) / (
        math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
    )


def lsh_buckets(vecs, n_tables: int = 8, n_planes: int = 8, seed: int = 7, dim: int = 64):
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((dim, n_tables * n_planes))
    bits = (vecs @ planes) > 0
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    return bits.reshape(len(vecs), n_tables, n_planes) @ weights


def mint_s_lsh_ann(
    query_id: int = 0, k: int = 10, hamming_radius: int = 1
) -> tuple[list[dict], "object"]:
    import pyarrow as pa

    ids, vecs = _embeddings()
    buckets = lsh_buckets(vecs)
    qi = ids.index(query_id)
    cands = []
    for i, vid in enumerate(ids):
        if vid == query_id:
            continue
        if any(
            bin(int(buckets[i, t]) ^ int(buckets[qi, t])).count("1") <= hamming_radius
            for t in range(buckets.shape[1])
        ):
            # rank on the UNROUNDED cosine (bit-identical to Spark's fold),
            # round only the projected value — matching lsh_bucketed_topk
            cands.append((vid, _cosine(vecs[i], vecs[qi])))
    cands.sort(key=lambda r: (-r[1], r[0]))
    rows = [{"vec_id": v, "cosine": spark_round(c)} for v, c in cands[:k]]
    schema = pa.schema([("vec_id", pa.int64()), ("cosine", pa.float64())])
    return rows, schema


def mint_s_ivf_ann(
    query_id: int = 0, k: int = 10, n_centroids: int = 16, n_probe: int = 4
) -> tuple[list[dict], "object"]:
    """Independent replica of the IVF spec (operators/similarity.py
    ivf_topk): md5-ordered sampled centroids, strict-left-fold cosine
    assignment with first-max-wins argmax, top-n_probe bucket probe,
    rounded-rank re-rank with id tiebreak (the cosine_topk contract)."""
    import hashlib
    import math

    import pyarrow as pa

    all_ids, all_vecs = _embeddings()
    # zero-norm vectors are excluded up front, mirroring ivf_assign (a
    # zero vector has no direction and no nearest centroid)
    keep = [
        i for i in range(len(all_ids))
        if math.sqrt(_fold_dot(
            [float(x) for x in all_vecs[i]], [float(x) for x in all_vecs[i]]
        )) > 0
    ]
    ids = [all_ids[i] for i in keep]
    vecs = [all_vecs[i] for i in keep]
    order = sorted(
        range(len(ids)), key=lambda i: (hashlib.md5(
            str(ids[i]).encode()).hexdigest(), ids[i])
    )[:n_centroids]
    cvecs = [[float(x) for x in vecs[i]] for i in order]
    cnrms = [math.sqrt(_fold_dot(c, c)) for c in cvecs]

    def argmax_first(sims):
        best = max(sims)
        return sims.index(best)  # first max wins = F.array_position

    buckets = []
    for i in range(len(ids)):
        vec = [float(x) for x in vecs[i]]
        nrm = math.sqrt(_fold_dot(vec, vec))
        sims = [
            _fold_dot(vec, c) / (nrm * cn) for c, cn in zip(cvecs, cnrms)
        ]
        buckets.append(argmax_first(sims))
    qi = ids.index(query_id)
    qvec = [float(x) for x in vecs[qi]]
    qnrm = math.sqrt(_fold_dot(qvec, qvec))
    qcos = [_fold_dot(qvec, c) / (qnrm * cn) for c, cn in zip(cvecs, cnrms)]
    # range over the ACTUAL centroid count, not the requested one (they
    # differ when the table is smaller than n_centroids)
    probes = set(
        sorted(range(len(cvecs)), key=lambda j: (-qcos[j], j))[:n_probe]
    )
    cands = []
    for i, vid in enumerate(ids):
        if vid == query_id or buckets[i] not in probes:
            continue
        vec = [float(x) for x in vecs[i]]
        nrm = math.sqrt(_fold_dot(vec, vec))
        cands.append(
            (vid, spark_round(_fold_dot(vec, qvec) / (nrm * qnrm)))
        )
    cands.sort(key=lambda r: (-r[1], r[0]))  # rounded rank, id tiebreak
    rows = [{"vec_id": v, "cosine": c} for v, c in cands[:k]]
    schema = pa.schema([("vec_id", pa.int64()), ("cosine", pa.float64())])
    return rows, schema


def mint_s_ivf_ann_batch(
    n_queries: int = 5, k: int = 5, n_centroids: int = 16, n_probe: int = 4
) -> tuple[list[dict], "object"]:
    """Batch form of mint_s_ivf_ann: same sampled quantizer and
    assignment, per-query probe + rounded-rank top-k."""
    import hashlib
    import math

    import pyarrow as pa

    all_ids, all_vecs = _embeddings()
    keep = [
        i for i in range(len(all_ids))
        if math.sqrt(_fold_dot(
            [float(x) for x in all_vecs[i]], [float(x) for x in all_vecs[i]]
        )) > 0
    ]
    ids = [all_ids[i] for i in keep]
    vecs = [all_vecs[i] for i in keep]
    order = sorted(
        range(len(ids)), key=lambda i: (hashlib.md5(
            str(ids[i]).encode()).hexdigest(), ids[i])
    )[:n_centroids]
    cvecs = [[float(x) for x in vecs[i]] for i in order]
    cnrms = [math.sqrt(_fold_dot(c, c)) for c in cvecs]
    buckets, nrms = [], []
    for i in range(len(ids)):
        vec = [float(x) for x in vecs[i]]
        nrm = math.sqrt(_fold_dot(vec, vec))
        nrms.append(nrm)
        sims = [
            _fold_dot(vec, c) / (nrm * cn) for c, cn in zip(cvecs, cnrms)
        ]
        buckets.append(sims.index(max(sims)))
    rows = []
    for qid in range(n_queries):
        qi = ids.index(qid)
        qvec = [float(x) for x in vecs[qi]]
        qnrm = nrms[qi]
        qcos = [
            _fold_dot(qvec, c) / (qnrm * cn) for c, cn in zip(cvecs, cnrms)
        ]
        probes = set(
            sorted(range(len(cvecs)), key=lambda j: (-qcos[j], j))[:n_probe]
        )
        cands = []
        for i, vid in enumerate(ids):
            if vid == qid or buckets[i] not in probes:
                continue
            vec = [float(x) for x in vecs[i]]
            cands.append(
                (vid, spark_round(_fold_dot(vec, qvec) / (nrms[i] * qnrm)))
            )
        cands.sort(key=lambda r: (-r[1], r[0]))
        rows.extend(
            {"query_id": qid, "cand_id": v, "cosine": c}
            for v, c in cands[:k]
        )
    schema = pa.schema(
        [("query_id", pa.int64()), ("cand_id", pa.int64()),
         ("cosine", pa.float64())]
    )
    return rows, schema


def mint_s_lsh_ann_batch(
    n_queries: int = 5, k: int = 5
) -> tuple[list[dict], "object"]:
    """Batch form: per query, candidates are hamming<=1 in any table (the
    multiprobe XOR-one-bit expansion is exactly the radius-1 ball), exact
    left-fold cosine re-rank, top-k per query."""
    import pyarrow as pa

    ids, vecs = _embeddings()
    buckets = lsh_buckets(vecs)
    rows = []
    for qid in range(n_queries):
        qi = ids.index(qid)
        cands = []
        for i, vid in enumerate(ids):
            if vid == qid:
                continue
            if any(
                bin(int(buckets[i, t]) ^ int(buckets[qi, t])).count("1") <= 1
                for t in range(buckets.shape[1])
            ):
                # unrounded rank, rounded projection (see mint_s_lsh_ann)
                cands.append((vid, _cosine(vecs[i], vecs[qi])))
        cands.sort(key=lambda r: (-r[1], r[0]))
        rows.extend(
            {"query_id": qid, "cand_id": v, "cosine": spark_round(c)}
            for v, c in cands[:k]
        )
    schema = pa.schema(
        [("query_id", pa.int64()), ("cand_id", pa.int64()), ("cosine", pa.float64())]
    )
    return rows, schema


# ---------------------------------------------------------------------
# t_url_canonical: independent replica of the URL canonicalization op
# ---------------------------------------------------------------------

# bare 'ref' deliberately absent (round-6 advice: many sites use it
# functionally; stripping it merges distinct pages before dedup)
_TRACKED_KEYS = ("fbclid", "gclid", "msclkid", "ref_src")

_URL_QUERIES = (
    "", "?utm_source=a", "?utm_a=1&utm_b=2", "?x=1&fbclid=F", "?ref=tw&x=2",
    "?x=1&gclid=9&y=2", "?x=1", "?utm_x=1&x=3&utm_y=2",
)


def _messy_url(d: int) -> str:
    """The deterministic dirty-url construction the Spark query mirrors:
    case noise, www, default ports, tracking params, fragments, trailing
    slashes — every rule of the canonicalizer exercised by residue class."""
    scheme = "HTTPS://" if d % 3 == 0 else "http://"
    www = "www." if d % 2 == 0 else ""
    host = f"Site{d % 7}.Example.com"
    if d % 5 == 0:
        port = ":443" if d % 3 == 0 else ":80"
    else:
        port = ""
    slash = "/" if d % 6 == 0 else ""
    frag = "#sec" if d % 5 == 1 else ""
    return (
        f"{scheme}{www}{host}{port}/Cat{d % 4}/doc-{d}{slash}"
        f"{_URL_QUERIES[d % 8]}{frag}"
    )


def _canonicalize_url(u: str) -> str:
    """Independent pure-string canonicalizer (no regex transliteration of
    the Spark form): fragment, authority case, www, default ports,
    tracking params, dangling separators, bare trailing slash."""
    u = u.split("#", 1)[0]
    m = u.find("://")
    stop = len(u)
    for ch in "/?#":
        k = u.find(ch, m + 3)
        if k != -1:
            stop = min(stop, k)
    head, rest = u[:stop].lower(), u[stop:]
    scheme, hostport = head.split("://", 1)
    if hostport.startswith("www."):
        hostport = hostport[4:]
    if scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[: -len(":80")]
    if scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[: -len(":443")]
    u = f"{scheme}://{hostport}{rest}"
    if "?" in u:
        path, q = u.split("?", 1)
        kept = [
            p
            for p in q.split("&")
            if "=" not in p
            or not (
                p.split("=", 1)[0] in _TRACKED_KEYS
                or p.split("=", 1)[0].startswith("utm_")
            )
        ]
        u = path + ("?" + "&".join(kept) if kept else "")
    u = u.rstrip("?&")
    if u.endswith("/") and not u.endswith("//"):
        u = u[:-1]
    return u


def mint_t_url_canonical() -> tuple[list[dict], "object"]:
    import pyarrow as pa

    rows = []
    for d in _documents(max_doc_id=200):
        did = int(d["doc_id"])
        raw = _messy_url(did)
        rows.append(
            {"doc_id": did, "url_raw": raw, "url_canon": _canonicalize_url(raw)}
        )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("url_raw", pa.string()),
            ("url_canon", pa.string()),
        ]
    )
    return rows, schema


# ---------------------------------------------------------------------
# t_pii_mask: independent TOKEN-BASED replica of the PII masker — a
# whitespace-token scanner with structural classifiers (digit-group
# parsing, octet range checks, local@domain splits), NOT a regex
# transliteration of the Spark form.  Scope: exact agreement on the
# deterministic fixture construction (and its documented negatives);
# pathological shapes outside it (6-group digit runs, mixed-dash card
# groupings) are out of contract, like every fixture oracle here.
# ---------------------------------------------------------------------


def _digits(s: str, lo: int, hi: int) -> bool:
    return s.isdigit() and lo <= len(s) <= hi


def _email_shape(tok: str) -> bool:
    if tok.count("@") != 1:
        return False
    local, dom = tok.split("@")
    if not local or any(not (c.isalnum() or c in "._%+-") for c in local):
        return False
    if "." not in dom:
        return False
    labels = dom.split(".")
    return (
        all(lab and all(c.isalnum() or c == "-" for c in lab) for lab in labels[:-1])
        and len(labels[-1]) >= 2
        and labels[-1].isalpha()
    )


def _ipv4_shape(tok: str) -> bool:
    parts = tok.split(".")
    return len(parts) == 4 and all(
        p.isdigit() and (p == "0" or p[0] != "0") and int(p) <= 255 for p in parts
    )


def _ssn_shape(tok: str) -> bool:
    p = tok.split("-")
    return (
        len(p) == 3 and _digits(p[0], 3, 3) and _digits(p[1], 2, 2)
        and _digits(p[2], 4, 4)
    )


def _cc_shape(tok: str) -> bool:
    if tok.isdigit() and len(tok) == 16:
        return True
    p = tok.split("-")
    return len(p) == 4 and all(_digits(x, 4, 4) for x in p)


def _phone_shape(tok: str) -> bool:
    # solid international form: '+' then 8-15 digits
    if tok.startswith("+") and _digits(tok[1:], 8, 15):
        return True
    s = tok
    groups: list[str] = []
    if s.startswith("+"):  # country-code group, must be followed by a sep
        j = 1
        while j < len(s) and s[j].isdigit():
            j += 1
        if not (2 <= j <= 4 and j < len(s) and s[j] in "-."):
            return False
        groups.append(s[1:j])
        s = s[j + 1 :]
    if s.startswith("("):  # parenthesized area group, optional sep after
        k = s.find(")")
        if k == -1 or not _digits(s[1:k], 2, 4):
            return False
        groups.append(s[1:k])
        s = s[k + 1 :]
        if s[:1] in ("-", "."):
            s = s[1:]
    i, n = 0, len(s)  # remaining: 2-4 digit groups joined by '-' or '.'
    while i < n:
        j = i
        while j < n and s[j].isdigit():
            j += 1
        if not 2 <= j - i <= 4:
            return False
        groups.append(s[i:j])
        i = j
        if i < n:
            if s[i] not in "-." or i + 1 == n:
                return False
            i += 1
    return 3 <= len(groups) <= 5


def _mask_pii_tokens(text: str) -> str:
    """Whitespace-token scan; trailing sentence punctuation is detached
    before classification and re-attached after (the Spark regexes bound
    matches with lookarounds, so '0123,' masks to '<PHONE>,')."""
    out = []
    for tok in text.split(" "):
        core = tok.rstrip(",.")
        tail = tok[len(core) :]
        if _email_shape(core):
            core = "<EMAIL>"
        elif _ipv4_shape(core):
            core = "<IP>"
        elif _ssn_shape(core):
            core = "<ID>"
        elif _cc_shape(core):
            core = "<CC>"
        elif _phone_shape(core):
            core = "<PHONE>"
        out.append(core + tail)
    return " ".join(out)


def _pii_raw_text(did: int) -> str:
    """The deterministic PII-bearing sentence the Spark query builds
    JVM-side from doc_id residue classes (t_pii_mask in queries.py)."""
    email = (
        "nobody"
        if did % 4 == 3
        else f"user{did % 50}.test+tag@Mail{did % 9}.Example.org"
    )
    phone = (
        f"+1-202-555-0{did % 1000:03d}",
        f"(415)555-2{did % 1000:03d}",
        f"020.7946.0{did % 1000:03d}",
        f"+4420794609{did % 100:02d}",
    )[did % 4]
    ip = (
        f"999.12.13.{did % 90 + 10}"
        if did % 5 == 0
        else f"10.{did % 256}.{did * 7 % 256}.{did % 100}"
    )
    acct = (
        f"4111-1111-1111-{did % 10000:04d}",
        f"411111111111{did % 10000:04d}",
        f"123-45-{did % 10000:04d}",
    )[did % 3]
    return (
        f"Contact {email} or call {phone}, logged from {ip} account {acct}"
        " in 2024 2025 v1.2 price 10.99."
    )


def mint_t_pii_mask() -> tuple[list[dict], "object"]:
    import pyarrow as pa

    rows = []
    for d in _documents(max_doc_id=200):
        did = int(d["doc_id"])
        raw = _pii_raw_text(did)
        rows.append(
            {"doc_id": did, "text_raw": raw, "text_masked": _mask_pii_tokens(raw)}
        )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text_raw", pa.string()),
            ("text_masked", pa.string()),
        ]
    )
    return rows, schema


# ---------------------------------------------------------------------
# p_corpus_curation: the end-to-end corpus->keeplist chain, re-derived
# with the golden assembly oracle + pure-string/hashlib replicas of
# every stage — the near-dup stage uses the EXACT n-gram Jaccard
# relation (the banded miner's output equals it on this corpus; a
# pytest test pins that equality every run)
# ---------------------------------------------------------------------

def _ws_fingerprint(md: str) -> str:
    """Replica of operators.dedup.normalized_fingerprint: md5 over
    lower(trim(text)) with ASCII whitespace runs collapsed.  Spark's
    ``trim`` strips only 0x20 and Java's ``\\s`` is ASCII-only, so the
    replica uses the explicit ASCII class, never Python's Unicode-aware
    ``strip``/``\\s``."""
    import re as _re

    t = _re.sub(r"[ \t\n\r\f\v]+", " ", md.strip(" ").lower())
    return hashlib.md5(t.encode("utf-8")).hexdigest()


def _jaccard_shingles(md: str, n: int = 3) -> set:
    toks = [w for w in md.lower().split(" ") if w]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _curation_crawl_rows() -> list[tuple[str, str]]:
    """(url, markdown) for the synthetic re-crawl: every extracted doc,
    its tracking-params duplicate, and (for the md5-selected quarter)
    the drop-first-line near-duplicate under /v2."""
    from markmuse_spark.golden import oracle
    from markmuse_spark.sources.corpus import _make_doc

    rows: list[tuple[str, str]] = []
    for i in range(200):
        url, _payload, expected, err = _make_doc(i, 42)
        if err is not None:
            continue
        md = oracle.assemble_document(url, expected)["markdown"]
        rows.append((url, md))
        rows.append((url + "?utm_source=crawl2&fbclid=x", md))
        if hashlib.md5(url.encode()).hexdigest()[0] < "4":
            near_md = md.split("\n", 1)[1] if "\n" in md else md
            rows.append((url + "/v2", near_md))
    return rows


def mint_p_corpus_curation() -> tuple[list[dict], "object"]:
    import pyarrow as pa

    crawl = _curation_crawl_rows()
    # stage 1+2: canonical-url survivorship (min url per canonical)
    by_canon: dict[str, list[tuple[str, str]]] = {}
    for url, md in crawl:
        by_canon.setdefault(_canonicalize_url(url), []).append((url, md))
    c1 = [
        (min(u for u, _ in grp), canon, dict(grp)[min(u for u, _ in grp)])
        for canon, grp in by_canon.items()
    ]
    # stage 3: exact text dedup (min url per fingerprint)
    by_fp: dict[str, list[tuple[str, str, str]]] = {}
    for url, canon, md in c1:
        by_fp.setdefault(_ws_fingerprint(md), []).append((url, canon, md))
    survivors = sorted(
        min(grp, key=lambda r: r[0]) for grp in by_fp.values()
    )
    # stage 4: near-dup survivorship via the EXACT jaccard relation
    sh = {url: _jaccard_shingles(md) for url, _c, md in survivors}
    dominated: set[str] = set()
    urls = [u for u, _c, _m in survivors]
    for i, a in enumerate(urls):
        sa = sh[a]
        if not sa:
            continue
        for b in urls[i + 1 :]:
            sb = sh[b]
            if not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.5:
                dominated.add(b)
    rows = [
        {"url": u, "canon_url": c, "n_chars": len(m)}
        for u, c, m in survivors
        if u not in dominated
    ]
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("canon_url", pa.string()),
            ("n_chars", pa.int32()),
        ]
    )
    return sorted(rows, key=lambda r: r["url"]), schema


# ---------------------------------------------------------------------
# mint-all entry point
# ---------------------------------------------------------------------

MINTERS = {
    "x_extract_corpus": mint_x_extract_corpus,
    "x_extract_corpus_2k": mint_x_extract_corpus_2k,
    "x_extract_enhanced": mint_x_extract_enhanced,
    "x_extract_images": mint_x_extract_images,
    "m_image_metadata": mint_m_image_metadata,
    "m_image_features": mint_m_image_features,
    "d_simhash_pairs": mint_d_simhash_pairs,
    "d_line_dedup": mint_d_line_dedup,
    "s_lsh_ann": mint_s_lsh_ann,
    "s_ivf_ann": mint_s_ivf_ann,
    "s_ivf_ann_batch": mint_s_ivf_ann_batch,
    "s_lsh_ann_batch": mint_s_lsh_ann_batch,
    "t_url_canonical": mint_t_url_canonical,
    "t_pii_mask": mint_t_pii_mask,
    "p_corpus_curation": mint_p_corpus_curation,
}


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.parquet")


def mint_table(name: str):
    import pyarrow as pa

    rows, schema = MINTERS[name]()
    return pa.Table.from_pylist(rows, schema=schema)


def main() -> None:
    import pyarrow.parquet as pq

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name in MINTERS:
        tbl = mint_table(name)
        pq.write_table(tbl, fixture_path(name), compression="zstd")
        print(f"minted {name}: {tbl.num_rows} rows -> {fixture_path(name)}")


if __name__ == "__main__":
    main()
