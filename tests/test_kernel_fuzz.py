"""Crash-safety fuzz: the extraction kernel must never raise through
``extract_document`` (per-row error capture is the A19 fault-tolerance
guarantee — one poisoned payload must not kill a 10^12-row job), and must
stay deterministic under repeated calls."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from markmuse_spark.kernel.extract import extract_document
from markmuse_spark.sources import docmodel



def _assert_row_invariant(row):
    """Round 7 (partial salvage): three legal row states — success
    (markdown, no error), hard error (no markdown, error), and PARTIAL
    (markdown AND a PartialExtraction note: salvaged pages ship with the
    damage disclosure). Anything else is a contract violation."""
    if row["error"] is None:
        assert row["markdown"] is not None
    elif row["error"].startswith("PartialExtraction:"):
        assert row["markdown"] is not None
    else:
        assert row["markdown"] is None


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_arbitrary_bytes_never_raise(payload):
    row = extract_document("https://f.example/x/doc", payload)
    assert set(row) == {
        "url", "markdown", "extracted_text", "n_pages", "n_images",
        "n_chars", "error",
    }
    _assert_row_invariant(row)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="<>/ab&#;=\"'!x[]()%PDF \n", min_size=0, max_size=2000))
def test_taglike_soup_never_raises(soup):
    row = extract_document("https://f.example/x/doc", soup.encode("utf-8"))
    assert row["error"] is None or row["markdown"] is None


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.data())
def test_mutated_real_html_never_raises(seed, data):
    rng = random.Random(seed)
    blocks = docmodel.random_page_blocks(rng, "en")
    payload = bytearray(docmodel.render_html(blocks, rng))
    # random byte mutations: truncate, splice, flip
    for _ in range(data.draw(st.integers(0, 5))):
        op = data.draw(st.integers(0, 2))
        if not payload:
            break
        pos = data.draw(st.integers(0, len(payload) - 1))
        if op == 0:
            del payload[pos:]
        elif op == 1:
            payload[pos] = data.draw(st.integers(0, 255))
        else:
            payload[pos : pos + 1] = b"<" * data.draw(st.integers(0, 3))
    row = extract_document("https://f.example/x/doc", bytes(payload))
    row2 = extract_document("https://f.example/x/doc", bytes(payload))
    assert row == row2  # bit-stable under repetition


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 3000))
def test_truncated_pdf_never_raises(seed, cut):
    rng = random.Random(seed)
    from markmuse_spark.sources import pdf_writer

    pdf = pdf_writer.write_pdf(docmodel.random_pdf_pages(rng, "en"))
    row = extract_document("https://f.example/x/d.pdf", pdf[: min(cut, len(pdf))])
    _assert_row_invariant(row)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 200))
def test_corrupted_flate_stream_is_per_row_error(seed, flip):
    """A Flate-compressed content stream with corrupted bytes must surface
    as a per-row error (ValueError path), never an uncaught exception."""
    rng = random.Random(f"flate:{seed}")
    pages = docmodel.random_pdf_pages(rng, "en")
    for p in pages:
        p["compress"] = True
    from markmuse_spark.sources import pdf_writer

    payload = bytearray(pdf_writer.write_pdf(pages))
    i = payload.find(b"stream\n") + 7 + (flip % 40)
    if i < len(payload):
        payload[i] ^= 0xFF
    row = extract_document("https://x/fz.pdf", bytes(payload))
    # either it still parses (flip hit a non-stream byte) or it errors
    assert row["error"] is None or "Error" in row["error"] or ":" in row["error"]


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000))
def test_hex_and_tj_mutations_never_raise(seed):
    """Random mutations inside hex strings / TJ arrays stay contained."""
    rng = random.Random(f"hextj:{seed}")
    pages = docmodel.random_pdf_pages(rng, "zh")
    for p in pages:
        p["hex"] = True
        p["tj"] = True
        p["compress"] = False
    from markmuse_spark.sources import pdf_writer

    payload = bytearray(pdf_writer.write_pdf(pages))
    for _ in range(10):
        payload[rng.randrange(len(payload))] = rng.randrange(256)
    row = extract_document("https://x/hx.pdf", bytes(payload))
    assert "url" in row  # never raises; error column optional


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_media_header_parsers_never_raise(data):
    """The multimodal byte-stream parsers share the kernel's crash-safety
    contract: arbitrary bytes (including mutated container magics) yield
    typed values or None, never an exception."""
    from markmuse_spark.operators.multimodal import (
        parse_dimensions, parse_duration_ms, sniff_format,
    )

    for prefix in (b"", b"RIFF\x20\x00\x00\x00WEBP", b"RIFF\x20\x00\x00\x00WAVE",
                   b"\x00\x00\x00\x10ftyp", b"\x89PNG\r\n\x1a\n"):
        blob = prefix + data
        fmt = sniff_format(blob)
        w, h = parse_dimensions(blob, fmt)
        d = parse_duration_ms(blob, fmt)
        assert w is None or isinstance(w, int)
        assert h is None or isinstance(h, int)
        assert d is None or (isinstance(d, int) and d >= 0)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.binary(min_size=0, max_size=64)),
        min_size=0,
        max_size=24,
    )
)
def test_binary_views_matches_to_pylist(cells):
    """Property: the zero-copy accessor is value-equivalent to
    to_pylist() for every null/empty/content mix, on plain and sliced
    arrays of both offset widths."""
    import pyarrow as pa

    from markmuse_spark.operators.extract import _binary_views

    for t in (pa.binary(), pa.large_binary()):
        col = pa.array(cells, type=t)
        for arr in (col, col.slice(len(cells) // 3)):
            got = [None if v is None else bytes(v) for v in _binary_views(arr)]
            assert got == arr.to_pylist()


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_png_decoder_arbitrary_bytes_valueerror_only(data):
    """decode_png_pixels over arbitrary bytes (raw and magic-prefixed):
    a uint8 array or ValueError, never any other exception."""
    import numpy as np

    from markmuse_spark.operators.multimodal import decode_png_pixels

    for blob in (data, b"\x89PNG\r\n\x1a\n" + data):
        try:
            out = decode_png_pixels(blob)
            assert isinstance(out, np.ndarray) and out.dtype == np.uint8
        except ValueError:
            pass


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=0, max_value=255),
)
def test_png_decoder_mutated_real_png(flip_pos, flip_val):
    """One mutated byte in a real PNG: decode still yields pixels or a
    ValueError (structure damage), never a crash or a wild read."""
    import numpy as np

    from markmuse_spark.operators.multimodal import decode_png_pixels
    from markmuse_spark.sources.png_writer import encode_png

    rng = np.random.default_rng(7)
    base = bytearray(
        encode_png(
            rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8),
            filters=[0, 1, 2, 3, 4, 0, 1, 2],
        )
    )
    base[flip_pos % len(base)] = flip_val
    try:
        out = decode_png_pixels(bytes(base))
        assert isinstance(out, np.ndarray)
    except ValueError:
        pass


@settings(max_examples=120, deadline=None)
@given(st.integers(min_value=0, max_value=10**6), st.integers(min_value=0, max_value=255))
def test_mutated_predictor_xref_never_raises(pos, val):
    """One flipped byte in a PNG-predictor'd xref-stream PDF (corpus v9):
    extraction still returns a row (markdown or per-row error), never an
    exception — damaged predictor data degrades to the body scan."""
    from markmuse_spark.kernel.extract import extract_document
    from markmuse_spark.sources import pdf_writer

    pages = [{"columns": 1, "blocks": [{"t": "p", "text": "pred fuzz"}]}]
    pdf = bytearray(
        pdf_writer.write_pdf(pages, xref_stream=True, xref_predictor=True)
    )
    pdf[pos % len(pdf)] = val
    row = extract_document("https://x/p.pdf", bytes(pdf))
    assert "url" in row


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=400))
def test_stream_decoders_valueerror_only(data):
    """Corpus-v10 filter decoders on arbitrary bytes: decode or
    ValueError, never any other exception and never a hang."""
    from markmuse_spark.kernel import pdf_extract as px

    for dec in (px._lzw_decode, px._rl_decode, px._ahx_decode, px._a85_decode):
        try:
            out = dec(data)
            assert isinstance(out, bytes)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 400))
def test_mutated_encrypted_pdf_never_raises(seed, flip):
    """Bit-flipped RC4-encrypted files surface as per-row errors or
    still-parsing docs — never an uncaught exception (the A19 per-row
    error contract extends to the crypto path)."""
    import random as _random

    from markmuse_spark.kernel.extract import extract_document
    from markmuse_spark.sources import pdf_writer

    rng = _random.Random(f"encfz:{seed}")
    pages = docmodel.random_pdf_pages(rng, "en")
    payload = bytearray(pdf_writer.write_pdf(pages, encrypt=True))
    payload[flip % len(payload)] ^= 0xA5
    row = extract_document("https://x/efz.pdf", bytes(payload))
    _assert_row_invariant(row)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 400))
def test_mutated_filter_chain_pdf_never_raises(seed, flip):
    """Bit-flipped LZW/A85/RL/AHx content streams follow the same
    per-row error contract as the Flate form."""
    import random as _random

    from markmuse_spark.kernel.extract import extract_document
    from markmuse_spark.sources import pdf_writer

    rng = _random.Random(f"filtfz:{seed}")
    pages = docmodel.random_pdf_pages(rng, "en")
    forms = ("lzw", "a85_flate", "rl", "ahx")
    for k, p in enumerate(pages):
        p["filters"] = forms[k % 4]
    payload = bytearray(pdf_writer.write_pdf(pages))
    payload[flip % len(payload)] ^= 0x5A
    row = extract_document("https://x/ffz.pdf", bytes(payload))
    _assert_row_invariant(row)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 400), st.sampled_from(["aesv2", "aesv3r5"]))
def test_mutated_aes_pdf_never_raises(seed, flip, cipher):
    """Bit-flipped AES-encrypted files (V4 per-object keys, V5 file key)
    follow the same per-row error contract: structured error or a
    still-parsing doc, never an uncaught exception or silent byte salad.
    (R6 is excluded here only for its deliberate ~1s/file KDF cost; it
    shares every code path past the password hash.)"""
    import random as _random

    from markmuse_spark.kernel.extract import extract_document
    from markmuse_spark.sources import pdf_writer

    rng = _random.Random(f"aesfz:{seed}:{cipher}")
    pages = docmodel.random_pdf_pages(rng, "en")
    xs = cipher == "aesv3r5"
    payload = bytearray(
        pdf_writer.write_pdf(pages, encrypt=cipher, xref_stream=xs)
    )
    payload[flip % len(payload)] ^= 0xA5
    row = extract_document("https://x/aesfz.pdf", bytes(payload))
    _assert_row_invariant(row)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(0, 10_000),
    st.binary(min_size=0, max_size=1024),
    st.integers(0, 100_000),
)
def test_junk_prefixed_truncated_pdf_never_raises(seed, junk, cut):
    """Corpus-v17.1 composition fuzz: ARBITRARY junk before the header ×
    arbitrary truncation — the wild-download worst case.  The kernel
    must hold the three-state row invariant (success / hard error /
    partial salvage) for every combination, and a junk prefix containing
    the PDF magic itself must never smuggle bytes into the text."""
    import random

    from markmuse_spark.sources import pdf_writer

    rng = random.Random(seed)
    pdf = pdf_writer.write_pdf(docmodel.random_pdf_pages(rng, "en"))
    payload = junk + pdf[: min(cut, len(pdf))]
    row = extract_document("https://f.example/x/d.pdf", payload)
    _assert_row_invariant(row)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 100_000))
def test_hybrid_xref_truncated_never_raises(seed, cut):
    """Hybrid-reference files (classic trailer + /XRefStm) under
    arbitrary truncation: the stream-over-classic precedence path must
    degrade exactly like the classic path — structured rows only."""
    import random

    from markmuse_spark.sources import pdf_writer

    rng = random.Random(seed)
    pdf = pdf_writer.write_pdf(
        docmodel.random_pdf_pages(rng, "en"), hybrid_xref=True
    )
    row = extract_document("https://f.example/x/h.pdf", pdf[: min(cut, len(pdf))])
    _assert_row_invariant(row)
