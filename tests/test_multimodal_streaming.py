"""Multimodal plumbing (real schemas/parsing, stubbed decode) and
incremental Structured-Streaming extraction."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from markmuse_spark.operators import multimodal
from markmuse_spark.sources import corpus


def _png(w, h, payload=b"x" * 50):
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + payload


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 50


def _jpeg(w, h):
    sof = b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", h, w)
    return b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof + b"\x00" * 40


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("a", _png(640, 480)),
        ("b", _gif(32, 16)),
        ("c", _jpeg(1920, 1080)),
        ("d", b"RIFF1234WAVE" + b"\x00" * 40),
        ("e", b"not an image at all, just bytes" * 4),
        ("f", None),
    ]
    return spark.createDataFrame(rows, "media_id string, payload binary")


def test_image_metadata(media):
    out = {r["_id"]: r for r in multimodal.image_metadata(media, "media_id", "payload").collect()}
    assert out["a"]["format"] == "png" and (out["a"]["width"], out["a"]["height"]) == (640, 480)
    assert out["b"]["format"] == "gif" and (out["b"]["width"], out["b"]["height"]) == (32, 16)
    assert out["c"]["format"] == "jpeg" and (out["c"]["width"], out["c"]["height"]) == (1920, 1080)
    assert out["d"]["format"] == "wav"
    assert out["e"]["format"] is None and out["e"]["n_bytes"] > 0
    assert "f" not in out or out["f"]["sha1"] is None  # null payload row


def test_decode_seam_png_real_others_stubbed():
    """Round 6: PNG pixel decode is REAL (pure Python, no codec); the
    header-only PNG the old stub test used is now a loud ValueError; the
    NotImplementedError seam remains only for non-PNG containers."""
    import numpy as np

    from markmuse_spark.sources.png_writer import encode_png

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert (multimodal.decode_image_pixels(encode_png(px)) == px).all()
    with pytest.raises(ValueError):
        multimodal.decode_image_pixels(_png(1, 1))  # no IDAT: corrupt
    if multimodal._PIL_Image is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image_pixels(_jpeg(2, 2))


def test_features_real_for_png_fake_for_others_null_for_corrupt(media):
    """Round-6 feature contract: PNG -> real decoded stats; corrupt PNG
    -> NULL (never a silently fake vector for a real container); non-PNG
    -> the labeled deterministic fake; NULL payload -> NULL."""
    import math

    one = {r["media_id"]: r["features"] for r in multimodal.extract_image_features(media, "media_id", "payload").collect()}
    two = {r["media_id"]: r["features"] for r in multimodal.extract_image_features(media.repartition(5), "media_id", "payload").collect()}
    assert one == two
    assert one["f"] is None  # null payload
    assert one["a"] is None  # header-only PNG: corrupt -> loud null
    norm = math.sqrt(sum(x * x for x in one["c"]))  # jpeg: labeled fake
    assert abs(norm - 1.0) < 1e-5


def test_features_match_direct_computation_through_spark(spark):
    """End-to-end: spec pixels -> encoder -> Spark decode UDF must equal
    image_feature_vector over the spec pixels computed driver-side."""
    from markmuse_spark.operators.multimodal import image_feature_vector
    from markmuse_spark.sources.png_writer import (
        encode_png, png_pixel_spec, spec_filters,
    )

    rows, want = [], {}
    for did in range(12):
        px = png_pixel_spec(did, f"t{did}")
        rows.append(
            (str(did), encode_png(px, filters=spec_filters(did, px.shape[0])))
        )
        want[str(did)] = image_feature_vector(px)
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_image_features(
            df, "media_id", "payload"
        ).collect()
    }
    assert got == want
    assert all(len(v) == 16 for v in got.values())


def test_png_decoder_roundtrip_all_filters_and_color_types():
    import numpy as np

    from markmuse_spark.sources.png_writer import encode_png

    rng = np.random.default_rng(0)
    for ch in (1, 2, 3, 4):
        for ft in (0, 1, 2, 3, 4):
            px = rng.integers(0, 256, size=(9, 7, ch), dtype=np.uint8)
            back = multimodal.decode_png_pixels(encode_png(px, filters=ft))
            assert (back == px).all(), (ch, ft)
        mixed = [(r * 3 + 1) % 5 for r in range(9)]
        px = rng.integers(0, 256, size=(9, 7, ch), dtype=np.uint8)
        back = multimodal.decode_png_pixels(encode_png(px, filters=mixed))
        assert (back == px).all()


def test_png_decoder_palette_and_unsupported():
    import zlib as _zlib

    import numpy as np

    from markmuse_spark.sources.png_writer import _chunk, encode_png

    pal = bytes(range(30))  # 10 RGB entries
    idx = np.array([[0, 1, 2], [9, 4, 5]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", _zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    back = multimodal.decode_png_pixels(png)
    assert (back == np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx]).all()

    # out-of-range palette index: loud, never a wild gather
    bad = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal[:9])
        + _chunk(b"IDAT", _zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette"):
        multimodal.decode_png_pixels(bad)

    # 16-bit and interlaced stay OUT of the supported subset, loudly
    for depth, inter in ((16, 0), (8, 1)):
        ih = struct.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, inter)
        p = (
            b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ih)
            + _chunk(b"IDAT", _zlib.compress(b"\x00" * 32))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            multimodal.decode_png_pixels(p)


def test_frame_sampling_shape(media):
    frames = multimodal.sample_video_frames(media, "media_id", "payload", every_n_bytes=32, max_frames=3)
    rows = frames.filter(F.col("_id") == "e").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["byte_offset"] for r in rows] == [0, 32, 64]
    assert all(isinstance(r["frame"], (bytes, bytearray)) for r in rows)


def test_incremental_streaming_exactly_once(spark, tmp_path):
    from markmuse_spark.streaming.incremental import run_incremental

    root = str(tmp_path / "pages_root")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus.pages_dataframe(spark, 60, seed=42, partitions=2).write.mode("append").parquet(root)
    n1 = run_incremental(spark, root, out, ckpt)
    assert n1 == 60
    # drain again with no new data -> nothing reprocessed
    assert run_incremental(spark, root, out, ckpt) == 0
    # land more files -> only the delta is processed
    corpus.pages_dataframe(spark, 140, seed=42, partitions=2).write.mode(
        "append"
    ).parquet(root)
    n3 = run_incremental(spark, root, out, ckpt)
    assert n3 == 140
    got = spark.read.parquet(f"{out}/extracted_stream")
    assert got.count() == 200
    # urls 0..59 appear twice (the second landing re-included them as new
    # FILES); streaming exactly-once is per file, dedup-by-url stays the
    # batch pipeline's resume anti-join job
    assert got.select("url").distinct().count() == 140


def test_windowed_throughput_memory_sink(spark, tmp_path):
    from markmuse_spark.streaming.incremental import windowed_throughput

    root = str(tmp_path / "pages_root")
    corpus.pages_dataframe(spark, 80, seed=42, partitions=2).write.parquet(root)
    agg = windowed_throughput(spark, root, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tp")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from tp").collect()
    assert rows
    assert sum(r["n_docs"] for r in rows) == 80
    assert all(r["total_bytes"] >= 0 for r in rows)


def test_stateful_running_stats_across_batches(spark, tmp_path):
    from pyspark.sql import functions as F

    from markmuse_spark.streaming.incremental import PAGES_SCHEMA
    from markmuse_spark.streaming.stateful import running_lang_stats

    root = str(tmp_path / "pages_root")
    # two separate files -> maxFilesPerTrigger=1 forces two micro-batches,
    # so the final totals prove state persisted across batches
    corpus.pages_dataframe(spark, 50, seed=42, partitions=1).write.mode("append").parquet(root)
    corpus.pages_dataframe(spark, 100, seed=42, partitions=1).filter(
        F.col("url") > ""
    ).write.mode("append").parquet(root)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(root)
    )
    q = (
        running_lang_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("langstats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "select lang, max(total_docs) as d, max(batches_seen) as b "
        "from langstats group by lang order by lang"
    ).collect()
    assert sum(r["d"] for r in rows) == 150
    assert max(r["b"] for r in rows) >= 2  # state survived across batches


def test_incremental_new_lineage_does_not_overwrite_old(spark, tmp_path):
    """Epoch ids restart at 0 for a fresh checkpoint dir; the epoch_key
    lineage prefix must keep the old lineage's partitions intact instead
    of dynamically overwriting them."""
    from markmuse_spark.streaming.incremental import run_incremental

    root = str(tmp_path / "pages_root")
    out = str(tmp_path / "out")
    corpus.pages_dataframe(spark, 40, seed=42, partitions=2).write.mode(
        "append"
    ).parquet(root)
    assert run_incremental(spark, root, out, str(tmp_path / "ckptA")) == 40
    # operator repoints to a FRESH checkpoint (routine ops action):
    # everything is re-drained as a new lineage with epoch ids from 0
    assert run_incremental(spark, root, out, str(tmp_path / "ckptB")) == 40
    got = spark.read.parquet(f"{out}/extracted_stream")
    # both lineages' rows present — nothing silently destroyed
    assert got.count() == 80
    assert got.select("epoch_key").distinct().count() == 2


def test_decode_image_pixels_real_world_png():
    """A wild 1x1 PNG (standard encoder output) decodes through the
    pure-Python path in EVERY environment — no codec required since
    round 6 (this was the PIL-seam stub test)."""
    import base64

    from markmuse_spark.operators import multimodal

    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNg"
        "YGBgAAAABQABh6FO1AAAAABJRU5ErkJggg=="
    )
    img = multimodal.decode_image_pixels(png_1x1)
    assert img.shape[:2] == (1, 1)


def _webp_vp8x(w, h):
    return (
        b"RIFF\x16\x00\x00\x00WEBPVP8X\x0a\x00\x00\x00\x00\x00\x00\x00"
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    )


def _webp_vp8l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    return (
        b"RIFF\x14\x00\x00\x00WEBPVP8L\x05\x00\x00\x00\x2f"
        + struct.pack("<I", bits)
    )


def _webp_vp8(w, h):
    return (
        b"RIFF\x1a\x00\x00\x00WEBPVP8 \x0a\x00\x00\x00"
        + b"\x00\x00\x00\x9d\x01\x2a"
        + struct.pack("<HH", w, h)
    )


def _wav(byte_rate, data_size):
    return (
        b"RIFF" + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00"
        + struct.pack("<I", byte_rate // 2) + struct.pack("<I", byte_rate)
        + b"\x02\x00\x10\x00data" + struct.pack("<I", data_size)
    )


def _mp4(timescale, duration, v=0):
    if v == 0:
        mvhd = (
            b"\x00\x00\x00\x1cmvhd" + b"\x00\x00\x00\x00" + b"\x00" * 8
            + struct.pack(">II", timescale, duration)
        )
    else:
        mvhd = (
            struct.pack(">I", 8 + 4 + 16 + 4 + 8) + b"mvhd"
            + b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">I", timescale) + struct.pack(">Q", duration)
        )
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00" + moov


def test_webp_dimension_parsing_all_three_flavors():
    for mk in (_webp_vp8x, _webp_vp8l, _webp_vp8):
        data = mk(640, 480)
        assert multimodal.sniff_format(data) == "webp", mk.__name__
        assert multimodal.parse_dimensions(data, "webp") == (640, 480), mk.__name__
    # 14-bit ceiling of the packed VP8L/VP8 fields
    assert multimodal.parse_dimensions(_webp_vp8l(16384, 16384), "webp") == (16384, 16384)
    # truncated header: None, never a raise
    assert multimodal.parse_dimensions(_webp_vp8x(64, 64)[:20], "webp") == (None, None)


def test_wav_mp4_duration_parsing():
    wav = _wav(16000, 48000)  # 48000 bytes at 16 kB/s -> 3000 ms
    assert multimodal.sniff_format(wav) == "wav"
    assert multimodal.parse_duration_ms(wav, "wav") == 3000
    mp4_v0 = _mp4(1000, 2500, v=0)
    mp4_v1 = _mp4(600, 1500, v=1)
    assert multimodal.sniff_format(mp4_v0) == "mp4"
    assert multimodal.parse_duration_ms(mp4_v0, "mp4") == 2500
    assert multimodal.parse_duration_ms(mp4_v1, "mp4") == 1500 * 1000 // 600
    # zero timescale / truncated boxes: None, never a raise or div-zero
    assert multimodal.parse_duration_ms(_mp4(0, 10), "mp4") is None
    assert multimodal.parse_duration_ms(mp4_v0[:20], "mp4") is None
    assert multimodal.parse_duration_ms(wav[:16], "wav") is None


def test_image_metadata_carries_duration_column(spark):
    rows = [("w", _wav(16000, 16000)), ("m", _mp4(1000, 1250)), ("p", _png(8, 4))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["_id"]: r for r in multimodal.image_metadata(df, "media_id", "payload").collect()}
    assert out["w"]["duration_ms"] == 1000 and out["w"]["width"] is None
    assert out["m"]["duration_ms"] == 1250
    assert out["p"]["duration_ms"] is None and out["p"]["width"] == 8


def test_wav_short_fmt_chunk_yields_none():
    """A fmt chunk declaring csize < 16 cannot hold a byte rate; the
    walk must not unpack the next chunk's header as one (review catch)."""
    bad = (
        b"RIFF" + struct.pack("<I", 20)
        + b"WAVEfmt " + struct.pack("<I", 0)
        + b"data" + struct.pack("<I", 8000)
    )
    assert multimodal.sniff_format(bad) == "wav"
    assert multimodal.parse_duration_ms(bad, "wav") is None


# ------------------------------------------------------------------
# GIF pixel decode (real, lossless — extends the PNG real-decode story)
# ------------------------------------------------------------------


def test_gif_roundtrip_bit_exact():
    import numpy as np

    from markmuse_spark.operators import multimodal as m
    from markmuse_spark.sources import gif_writer as g

    for did in (0, 1, 7, 12, 23, 44):
        gif = g.encode_gif(g.gif_palette(did), g.gif_index_spec(did, f"t{did}"))
        px = m.decode_gif_pixels(gif)
        want = g.gif_pixel_spec(did, f"t{did}")
        assert px.shape == want.shape and (px == want).all(), did
    # large image: LZW width growth, clear-reset, multiple sub-blocks
    big = (np.arange(200 * 190).reshape(200, 190) % 64).astype(np.uint8)
    pal = g.gif_palette(7)
    assert (m.decode_gif_pixels(g.encode_gif(pal, big)) == pal[big]).all()


def test_gif_decode_rejects_out_of_subset_forms():
    import pytest

    from markmuse_spark.operators import multimodal as m
    from markmuse_spark.sources import gif_writer as g

    gif = bytearray(g.encode_gif(g.gif_palette(3), g.gif_index_spec(3, "x")))
    # image descriptor sits right after header (13) + the 2^(k+1)-entry
    # GCT — indexing for 0x2C would false-hit palette bytes
    k = gif[10] & 0x07
    i = 13 + 3 * (2 << k)
    assert gif[i] == 0x2C
    inter = bytearray(gif)
    inter[i + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        m.decode_gif_pixels(bytes(inter))
    with pytest.raises(ValueError, match="not a GIF"):
        m.decode_gif_pixels(b"GIFxxx" + bytes(20))
    with pytest.raises(ValueError):
        m.decode_gif_pixels(bytes(gif[: len(gif) // 2]))  # truncated


def test_gif_decode_fuzz_never_hangs_or_crashes_uncontrolled():
    import random

    from markmuse_spark.operators import multimodal as m
    from markmuse_spark.sources import gif_writer as g

    rng = random.Random(42)
    base = g.encode_gif(g.gif_palette(5), g.gif_index_spec(5, "fuzz"))
    for _ in range(300):
        b = bytearray(base)
        for _k in range(rng.randint(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            px = m.decode_gif_pixels(bytes(b))
            assert px.ndim == 3  # survived mutation: still a matrix
        except ValueError:
            pass  # structured rejection is the contract
