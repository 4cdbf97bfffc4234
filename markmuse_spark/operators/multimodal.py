"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with real Spark-side plumbing and stubbed heavy decode.

What is REAL here (and tested): schemas, batch shapes, Arrow transfer of
binary columns, magic-byte container sniffing, PNG/JPEG/GIF header parsing
(pure byte-stream, no image libs), deterministic feature extraction, frame-
sample plumbing.  What is STUBBED (this container ships no image/audio
codecs): pixel decode — ``decode_image_pixels`` raises
``NotImplementedError`` unless PIL is importable, and
``extract_image_features`` substitutes a clearly-marked deterministic fake
(md5-seeded vector) so downstream similarity plumbing can be exercised
end-to-end.

Reference parity note: the reference treats images exactly this way — an
opaque base64/bytes payload with an id, normalized and stored, never
decoded (``markmuse.py:385-460``); captioning is delegated to an external
LLM (excluded from the deterministic engine, SURVEY §7).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_DDL = (
    "format string, width int, height int, duration_ms bigint, "
    "n_bytes long, sha1 string"
)

try:  # pragma: no cover - not present in this container
    from PIL import Image as _PIL_Image  # type: ignore
except Exception:  # noqa: BLE001
    _PIL_Image = None


def sniff_format(data: Optional[bytes]) -> Optional[str]:
    """Container sniffing by magic bytes (pure, no libs)."""
    if not data or len(data) < 12:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[4:8] == b"ftyp":
        return "mp4"
    return None


def parse_dimensions(data: bytes, fmt: Optional[str]) -> tuple[Optional[int], Optional[int]]:
    """Width/height from container headers (PNG IHDR, JPEG SOFn, GIF LSD,
    WEBP VP8/VP8L/VP8X — all three WebP bitstream flavors, pure
    byte-stream parses like the rest)."""
    try:
        if fmt == "png" and len(data) >= 24 and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            return int(w), int(h)
        if fmt == "gif" and len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
            return int(w), int(h)
        if fmt == "webp" and len(data) >= 25:
            four = data[12:16]
            body = data[20:]
            # per-flavor length gates: a truncated header must yield
            # (None, None), never a short-slice misread
            if four == b"VP8X" and len(body) >= 10:  # 24-bit LE canvas - 1
                w = int.from_bytes(body[4:7], "little") + 1
                h = int.from_bytes(body[7:10], "little") + 1
                return w, h
            if four == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
                bits = int.from_bytes(body[1:5], "little")  # 14-bit pack
                return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
            if four == b"VP8 " and len(body) >= 10 and body[3:6] == b"\x9d\x01\x2a":
                w = int.from_bytes(body[6:8], "little") & 0x3FFF
                h = int.from_bytes(body[8:10], "little") & 0x3FFF
                return w, h
        if fmt == "jpeg":
            i = 2
            while i + 9 < len(data):
                if data[i] != 0xFF:
                    i += 1
                    continue
                marker = data[i + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                    return int(w), int(h)
                seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
                i += 2 + seg_len
    except Exception:
        pass
    return None, None


def parse_duration_ms(data: bytes, fmt: Optional[str]) -> Optional[int]:
    """Duration in milliseconds from audio/video container headers —
    WAV (RIFF chunk walk: ``fmt ``'s byte rate over ``data``'s declared
    size) and MP4 (box walk to ``moov``/``mvhd``: declared duration over
    the movie timescale, version 0 and 1 layouts).  Pure byte-stream
    parses; floor division keeps the value integral and engine-
    independent.  None for images, truncated headers, or zero rates."""
    try:
        if fmt == "wav":
            byte_rate = data_size = None
            i = 12
            while i + 8 <= len(data):
                four = data[i : i + 4]
                csize = struct.unpack("<I", data[i + 4 : i + 8])[0]
                # a fmt chunk shorter than the 16-byte PCM layout cannot
                # contain a byte rate — reading past its declared end
                # would unpack the NEXT chunk's header as a rate
                if four == b"fmt " and csize >= 16 and i + 20 <= len(data):
                    byte_rate = struct.unpack("<I", data[i + 16 : i + 20])[0]
                elif four == b"data":
                    data_size = csize
                if byte_rate is not None and data_size is not None:
                    break
                i += 8 + csize + (csize & 1)  # chunks pad to even
            if byte_rate and data_size is not None:
                return data_size * 1000 // byte_rate
        if fmt == "mp4":
            i = 0
            while i + 8 <= len(data):  # top-level box walk
                size = struct.unpack(">I", data[i : i + 4])[0]
                if data[i + 4 : i + 8] == b"moov":
                    j = i + 8
                    end = min(i + size, len(data))
                    while j + 8 <= end:  # moov children
                        csize = struct.unpack(">I", data[j : j + 4])[0]
                        if data[j + 4 : j + 8] == b"mvhd" and j + 9 <= end:
                            v = data[j + 8]
                            if v == 1 and j + 40 <= end:
                                ts = struct.unpack(">I", data[j + 28 : j + 32])[0]
                                dur = struct.unpack(">Q", data[j + 32 : j + 40])[0]
                            elif j + 28 <= end:
                                ts = struct.unpack(">I", data[j + 20 : j + 24])[0]
                                dur = struct.unpack(">I", data[j + 24 : j + 28])[0]
                            else:
                                return None
                            return dur * 1000 // ts if ts else None
                        if csize < 8:
                            break
                        j += csize
                if size < 8:
                    break
                i += size
    except Exception:
        pass
    return None


def image_metadata(frames: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata struct per binary payload (mapInArrow; bytes never
    leave the executor, output is a small struct)."""
    import pyarrow as pa

    out_schema = pa.schema(
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

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from markmuse_spark.operators.extract import _binary_views

        for batch in batches:
            ids = batch.column(0).to_pylist()
            blobs = _binary_views(batch.column(1))  # zero-copy, like extract
            rows: dict[str, list[Any]] = {k: [] for k in out_schema.names}
            for i, data in zip(ids, blobs):
                fmt = sniff_format(data)
                w, h = parse_dimensions(data, fmt) if data else (None, None)
                rows["_id"].append(str(i))
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(
                    parse_duration_ms(data, fmt) if data else None
                )
                rows["n_bytes"].append(len(data) if data else 0)
                rows["sha1"].append(
                    hashlib.sha1(data).hexdigest() if data else None
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array(rows[n], type=out_schema.field(n).type) for n in out_schema.names],
                schema=out_schema,
            )

    return frames.select(
        F.col(id_col).cast("string"), F.col(bin_col)
    ).mapInArrow(run, "_id string, " + IMAGE_META_DDL)


def decode_image_pixels(data: bytes):  # pragma: no cover - stub
    """Pixel decode — STUB: the container has no image codecs.

    Wire-up point for PIL/pillow on a real cluster; everything around it
    (schema, batching, partitioning) is real and tested."""
    if _PIL_Image is None:
        raise NotImplementedError(
            "pixel decode requires an image codec (PIL) not present in this "
            "container; install pillow on the cluster to enable"
        )
    import io

    return _PIL_Image.open(io.BytesIO(data))


def extract_image_features(
    frames: DataFrame, id_col: str, bin_col: str, dim: int = 16
) -> DataFrame:
    """Deterministic FAKE feature vector per image (md5-seeded, clearly
    marked): stands in for a real embedding model so that the downstream
    ANN/dedup plumbing (array<float> column, cosine ops) runs end-to-end.
    Swap the kernel for a real encoder on a cluster with codecs."""
    import numpy as np
    import pandas as pd

    def _feat(blobs):
        out = []
        for data in blobs:
            if data is None:
                out.append(None)
                continue
            digest = hashlib.md5(bytes(data)).digest()
            seed = int.from_bytes(digest[:8], "big")
            rng = np.random.default_rng(seed)
            vec = rng.standard_normal(dim)
            out.append((vec / np.linalg.norm(vec)).astype(np.float32).tolist())
        return pd.Series(out)

    _feat.__annotations__ = {"blobs": pd.Series, "return": pd.Series}
    _feat = F.pandas_udf(_feat, "array<float>")

    return frames.select(
        F.col(id_col), _feat(F.col(bin_col)).alias("features")
    )


def sample_video_frames(
    media: DataFrame,
    id_col: str,
    bin_col: str,
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame".

    Real decoder absent -> frames are deterministic byte windows of the
    container (offset/step schema identical to a real frame sampler);
    demonstrates the 1->N explode shape and per-frame binary payloads."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("_id", pa.string()),
            ("frame_idx", pa.int32()),
            ("byte_offset", pa.int64()),
            ("frame", pa.binary()),
        ]
    )

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from markmuse_spark.operators.extract import _binary_views

        for batch in batches:
            ids = batch.column(0).to_pylist()
            blobs = _binary_views(batch.column(1))  # zero-copy, like extract
            out: dict[str, list[Any]] = {n: [] for n in schema.names}
            for i, data in zip(ids, blobs):
                if not data:
                    continue
                for k in range(min(max_frames, 1 + (len(data) - 1) // every_n_bytes)):
                    off = k * every_n_bytes
                    out["_id"].append(str(i))
                    out["frame_idx"].append(k)
                    out["byte_offset"].append(off)
                    out["frame"].append(bytes(data[off : off + 256]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out[n], type=schema.field(n).type) for n in schema.names],
                schema=schema,
            )

    return media.select(F.col(id_col).cast("string"), F.col(bin_col)).mapInArrow(
        run, "_id string, frame_idx int, byte_offset long, frame binary"
    )
