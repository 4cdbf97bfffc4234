"""Seeded minimal-PDF writer: document model -> structurally valid PDF bytes.

Fixture-side counterpart of :mod:`markmuse_spark.kernel.pdf_extract`.  The
dialect is deliberately constrained (SURVEY.md §7 risk 2) but real PDF:
``%PDF-1.4`` header, catalog/pages/page objects, per-page uncompressed
content streams with standard text operators, xref table, trailer.  Every
text run is absolutely positioned::

    BT /F1 {size} Tf 1 0 0 1 {x} {y} Tm ({text}) Tj ET

Layout rules (the spec the extractor's box-geometry heuristics must invert):

* page 612x792; single column at x=72, two-column at x=72 / x=326
* body font 10pt, line height 14; headings h1/h2/h3 at 24/18/14pt
* consecutive lines of one block are 14 apart; blocks are 28+ apart
* paragraphs greedy-wrapped at a per-column character budget; list items one
  line each, written with their ``- `` / ``1. `` markers
* two-column pages fill the left column with the first half of the blocks,
  then the right column (reading order: left column first)

Non-ASCII text is emitted as escaped UTF-8 bytes inside literal strings —
a dialect constraint, documented here and honored by the extractor — or,
on ``hex16`` pages (corpus v4), as BOM-prefixed UTF-16BE hex strings,
the spec 7.9.2.2 Unicode text-string form real producers emit.
"""

from __future__ import annotations

from typing import Any

PAGE_W, PAGE_H = 612, 792
MARGIN_TOP = 720
COL_X = {1: (72,), 2: (72, 326)}
WRAP = {1: 62, 2: 28}
BODY_SIZE = 10
HEAD_SIZE = {1: 24, 2: 18, 3: 14}
LINE_H = 14
BLOCK_GAP = 28


def _escape(s: str) -> bytes:
    b = s.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _wrap(text: str, width: int) -> list[str]:
    words = text.split()
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in words:
        add = len(w) + (1 if cur else 0)
        if cur and n + add > width:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    if cur:
        lines.append(" ".join(cur))
    return lines or [""]


def _layout_column(blocks: list[dict], x: int, width: int) -> list[tuple[int, int, int, str]]:
    """Place blocks into (size, x, y, text) runs going down from MARGIN_TOP."""
    runs: list[tuple[int, int, int, str]] = []
    y = MARGIN_TOP
    for b in blocks:
        t = b["t"]
        if t == "h":
            size = HEAD_SIZE[min(b["level"], 3)]
            runs.append((size, x, y, b["text"]))
            y -= BLOCK_GAP + size
        elif t == "p":
            text = " ".join(txt for _, txt in b["spans"]) if "spans" in b else b["text"]
            for line in _wrap(" ".join(text.split()), width):
                runs.append((BODY_SIZE, x, y, line))
                y -= LINE_H
            y -= BLOCK_GAP - LINE_H
        elif t in ("ul", "ol"):
            for i, item in enumerate(b["items"]):
                marker = "- " if t == "ul" else f"{i + 1}. "
                runs.append((BODY_SIZE, x, y, marker + item))
                y -= LINE_H
            y -= BLOCK_GAP - LINE_H
        else:
            raise ValueError(f"pdf dialect does not support block type {t!r}")
    return runs


def page_runs(page_model: dict[str, Any]) -> list[tuple[int, int, int, str]]:
    """All text runs for one page model {'columns': 1|2, 'blocks': [...]}."""
    cols = page_model.get("columns", 1)
    blocks = page_model["blocks"]
    xs = COL_X[cols]
    if cols == 1:
        return _layout_column(blocks, xs[0], WRAP[1])
    half = (len(blocks) + 1) // 2
    runs = _layout_column(blocks[:half], xs[0], WRAP[2])
    runs += _layout_column(blocks[half:], xs[1], WRAP[2])
    return runs


def _hex_string(text: str, bom16: bool = False) -> bytes:
    """PDF hex string (spec 7.3.4.3): utf-8 bytes as hex — or, with
    ``bom16``, UTF-16BE prefixed with the U+FEFF BOM, the standard
    Unicode text-string form (spec 7.9.2.2) real producers emit for
    non-WinAnsi text; the extractor detects the BOM per string."""
    raw = (
        ("\ufeff" + text).encode("utf-16-be") if bom16 else text.encode("utf-8")
    )
    return b"<%b>" % raw.hex().upper().encode("ascii")


def _tj_array(text: str, use_hex: bool, bom16: bool = False) -> bytes:
    """One line as a kerned ``TJ`` array: words as separate strings with a
    -250 (milli-em) inter-word adjustment — the form real PDF generators
    emit for justified text.  The extractor must re-insert the word space
    from the adjustment (threshold: adj <= -150)."""
    words = text.split(" ")
    parts = []
    for j, w in enumerate(words):
        if j:
            parts.append(b"-250")
        parts.append(
            _hex_string(w, bom16) if use_hex else b"(%b)" % _escape(w)
        )
    return b"[" + b" ".join(parts) + b"]"


def _content_stream(
    runs: list[tuple[int, int, int, str]],
    use_tj: bool,
    use_hex: bool,
    bom16: bool = False,
) -> bytes:
    parts = []
    for size, x, y, text in runs:
        if use_tj and " " in text:
            parts.append(
                b"BT /F1 %d Tf 1 0 0 1 %d %d Tm %b TJ ET"
                % (size, x, y, _tj_array(text, use_hex, bom16))
            )
        elif use_hex:
            parts.append(
                b"BT /F1 %d Tf 1 0 0 1 %d %d Tm %b Tj ET"
                % (size, x, y, _hex_string(text, bom16))
            )
        else:
            parts.append(
                b"BT /F1 %d Tf 1 0 0 1 %d %d Tm (%b) Tj ET"
                % (size, x, y, _escape(text))
            )
    return b"\n".join(parts)


def _cid_charset(pages: list[dict[str, Any]], runs_by_page: list) -> list[str]:
    """Sorted distinct characters used on ``cid``/``cid_noto`` pages —
    the document's subset-font charset; CID = 1 + index (a genuinely
    non-identity code assignment, exactly what real font subsetters
    produce).  One shared charset serves both fonts: the ToUnicode CMap
    (when any ``cid`` page exists) covers every assignment, and the
    no-ToUnicode font's assignments are unreadable by design."""
    chars: set[str] = set()
    for page, runs in zip(pages, runs_by_page):
        if page.get("cid") or page.get("cid_noto"):
            for _size, _x, _y, text in runs:
                chars.update(text)
    return sorted(chars)


def _cid_hex(text: str, cid_of: dict[str, int]) -> bytes:
    return b"<%b>" % "".join(f"{cid_of[c]:04X}" for c in text).encode("ascii")


def _cid_content_stream(
    runs: list[tuple[int, int, int, str]],
    use_tj: bool,
    cid_of: dict[str, int],
    font: bytes = b"F2",
) -> bytes:
    """Content stream for a ``cid`` page: ``font`` (a Type0 font), strings
    as 2-byte-CID hex; with ``tj`` the words are separate CID-hex pieces
    with kerning adjustments (the space char is then not emitted at all —
    the extractor must recover it from the adjustment, via the CMap path).
    ``cid_noto`` pages reuse this with /F3, the ToUnicode-less font."""
    parts = []
    for size, x, y, text in runs:
        if use_tj and " " in text:
            pieces = []
            for j, w in enumerate(text.split(" ")):
                if j:
                    pieces.append(b"-250")
                pieces.append(_cid_hex(w, cid_of))
            parts.append(
                b"BT /%b %d Tf 1 0 0 1 %d %d Tm [%b] TJ ET"
                % (font, size, x, y, b" ".join(pieces))
            )
        else:
            parts.append(
                b"BT /%b %d Tf 1 0 0 1 %d %d Tm %b Tj ET"
                % (font, size, x, y, _cid_hex(text, cid_of))
            )
    return b"\n".join(parts)


def _tounicode_cmap(charset: list[str]) -> bytes:
    """A ToUnicode CMap (spec 9.10.3) mapping each subset CID to its
    Unicode string, bfchar entries chunked at the spec's 100-per-block
    limit.  Target values are UTF-16BE hex, as the spec requires."""
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (MM) /Ordering (Subset) /Supplement 0 >> def",
        b"/CMapName /MM-Subset def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for off in range(0, len(charset), 100):
        chunk = charset[off : off + 100]
        lines.append(b"%d beginbfchar" % len(chunk))
        for k, ch in enumerate(chunk):
            uni = ch.encode("utf-16-be").hex().upper().encode("ascii")
            lines.append(b"<%04X> <%b>" % (off + k + 1, uni))
        lines.append(b"endbfchar")
    lines += [b"endcmap", b"CMapName currentdict /CMap defineresource pop",
              b"end", b"end"]
    return b"\n".join(lines)


_XMP_METADATA = (
    b'<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
    b'<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF '
    b'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
    b'<rdf:Description dc:title="generated"/></rdf:RDF></x:xmpmeta>\n'
    b"<?xpacket end=\"w\"?>"
)


def write_pdf(
    pages: list[dict[str, Any]],
    metadata: bool = False,
    xref_stream: bool = False,
    object_streams: bool = False,
    xref_predictor: bool = False,
) -> bytes:
    """Serialize page models into one PDF file (bytes).

    Per-page dialect knobs (in the page model):

    * ``"compress": True`` — the content stream is FlateDecode-compressed
      (zlib), as virtually all real-corpus PDFs are
    * ``"tj": True`` — text runs with spaces are emitted as kerned ``TJ``
      arrays instead of plain ``Tj`` strings
    * ``"hex": True`` — string operands emitted as ``<hex>`` strings
      (spec 7.3.4.3) instead of literal ``(...)`` strings
    * ``"hex16": True`` — string operands emitted as UTF-16BE hex strings
      with a leading U+FEFF BOM (the spec 7.9.2.2 Unicode text-string
      form; corpus v4) — implies hex emission
    * ``"cid": True`` — the page uses /F2, a Type0 /Identity-H SUBSET
      font (corpus v5): strings are 2-byte CIDs assigned by charset
      index (NOT code points), decodable only through the document's
      ToUnicode CMap stream — the realest real-corpus text form
    * ``"cid_noto": True`` — the page uses /F3, a Type0 font WITHOUT a
      ToUnicode CMap (corpus v8): the same charset-index CIDs with no
      decode path in the file — glyph-only, the form scanned-and-
      resubsetted wild PDFs show; the extractor must emit NO text for
      these strings (expected page markdown is empty), never byte salad

    ``metadata``: emit an XMP metadata stream object (corpus v5) — a
    NON-content stream the extractor must not turn into a phantom page.

    ``xref_stream``: emit a PDF 1.5 CROSS-REFERENCE STREAM (corpus v6)
    instead of the classic xref table + ``trailer`` dict: a final
    ``/Type /XRef`` stream object holding the FlateDecode-compressed
    binary entry table (``/W [1 4 2]``: 1-byte type, 4-byte offset,
    2-byte generation, big-endian; spec 7.5.8) with the trailer fields
    (``/Size /Root``) in its own dict, and ``startxref`` pointing at it.
    This is the modern-default file form — the extractor must resolve
    ``/Root`` through it and must never mint a phantom page from the
    binary entry data.

    ``xref_predictor`` (corpus v9, applies to either xref-stream form):
    the binary entry table is PNG-predicted before FlateDecode —
    ``/DecodeParms << /Predictor 12 /Columns 7 >>``, each 7-byte row
    prefixed with the PNG Up filter tag (2) and delta-coded against the
    previous row (spec 7.4.4.4).  This is the form most real-world PDF
    writers emit for xref streams (near-constant rows compress far
    better Up-filtered); the extractor must reverse the prediction
    before reading ``/W``-width entries.

    ``object_streams`` (corpus v7, implies ``xref_stream``): pack every
    NON-stream object — catalog, pages node, page dicts, font dicts —
    into one FlateDecode ``/Type /ObjStm`` stream (spec 7.5.7: an
    integer-pair header ``objnum offset`` per object, ``/First`` bytes
    in, then the object bodies), indexed from the xref stream via
    TYPE-2 entries ``(2, objstm_id, index)``.  This is how real modern
    producers serialize the page tree: none of the objects the page
    walk needs exist as top-level ``N 0 obj`` definitions, so a linear
    object scan alone sees only content streams — the extractor must
    unpack the ObjStm to reconstruct the graph.  Stream-bearing objects
    (content, CMap, metadata) stay top-level as the spec requires.

    Object layout: 1 catalog, 2 pages, 3 font /F1; then (when any page
    is ``cid``) /F2 Type0 font + its ToUnicode CMap stream; then (when
    ``metadata``) the XMP stream; then per page ``i``: page object,
    content stream — all ids computed from what precedes the pages, and
    every global object BEFORE the pages so references resolve for any
    page count.
    """
    import zlib

    runs_by_page = [page_runs(p) for p in pages]  # one layout pass per
    # page: _cid_charset and the emit loop below share these runs
    any_cid = any(p.get("cid") for p in pages)
    any_noto = any(p.get("cid_noto") for p in pages)
    charset = _cid_charset(pages, runs_by_page) if any_cid or any_noto else []
    cid_of = {c: k + 1 for k, c in enumerate(charset)}

    objects: list[bytes] = []
    n_pages = len(pages)
    next_id = 4
    f2_id = f3_id = cmap_id = meta_id = None
    if any_cid:
        f2_id, cmap_id = next_id, next_id + 1
        next_id += 2
    if any_noto:
        f3_id = next_id
        next_id += 1
    if metadata:
        meta_id = next_id
        next_id += 1
    first_page_id = next_id
    kids = " ".join(f"{first_page_id + 2 * i} 0 R" for i in range(n_pages))
    catalog = b"<< /Type /Catalog /Pages 2 0 R"
    if meta_id is not None:
        catalog += b" /Metadata %d 0 R" % meta_id
    objects.append(catalog + b" >>")
    objects.append(
        b"<< /Type /Pages /Kids [%b] /Count %d >>" % (kids.encode(), n_pages)
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    if any_cid:
        objects.append(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /MMSUB+Helvetica "
            b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % cmap_id
        )
        cmap = _tounicode_cmap(charset)
        objects.append(
            b"<< /Length %d >>\nstream\n%b\nendstream" % (len(cmap), cmap)
        )
    if any_noto:
        # corpus v8: a Type0 font with NO /ToUnicode at all — glyph-only
        # (the embedded font program that would carry glyph outlines is
        # out of dialect); the extractor must suppress its strings, not
        # mis-decode them
        objects.append(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /MMSUB2+Helvetica "
            b"/Encoding /Identity-H >>"
        )
    if metadata:
        objects.append(
            b"<< /Type /Metadata /Subtype /XML /Length %d >>\nstream\n%b\nendstream"
            % (len(_XMP_METADATA), _XMP_METADATA)
        )
    for i, page in enumerate(pages):
        content_num = first_page_id + 2 * i + 1
        font_res = b"/F1 3 0 R"
        if page.get("cid"):
            font_res = b"/F1 3 0 R /F2 %d 0 R" % f2_id
        elif page.get("cid_noto"):
            font_res = b"/F1 3 0 R /F3 %d 0 R" % f3_id
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << %b >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, font_res, content_num)
        )
        if page.get("cid"):
            stream = _cid_content_stream(
                runs_by_page[i], bool(page.get("tj")), cid_of
            )
        elif page.get("cid_noto"):
            stream = _cid_content_stream(
                runs_by_page[i], bool(page.get("tj")), cid_of, font=b"F3"
            )
        else:
            stream = _content_stream(
                runs_by_page[i],
                bool(page.get("tj")),
                bool(page.get("hex")) or bool(page.get("hex16")),
                bool(page.get("hex16")),
            )
        if page.get("compress"):
            stream = zlib.compress(stream, 6)
            objects.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%b\nendstream"
                % (len(stream), stream)
            )
        else:
            objects.append(
                b"<< /Length %d >>\nstream\n%b\nendstream" % (len(stream), stream)
            )

    if object_streams:
        xref_stream = True  # ObjStm entries are only addressable from one
    header = b"%PDF-1.5\n" if xref_stream else b"%PDF-1.4\n"
    out = bytearray(header + b"%\xe2\xe3\xcf\xd3\n")

    def _t1(off: int) -> bytes:  # type-1: in use at byte offset
        return b"\x01" + off.to_bytes(4, "big") + (0).to_bytes(2, "big")

    def _entry_stream(rows: list[bytes]) -> tuple[bytes, bytes]:
        """(compressed entry bytes, extra dict text): plain FlateDecode,
        or PNG-Up-predicted first (corpus v9) with the /DecodeParms the
        reader must honor to recover the /W-width rows."""
        if not xref_predictor:
            return zlib.compress(b"".join(rows), 6), b""
        width = len(rows[0])
        out = bytearray()
        prev = bytes(width)
        for r in rows:  # PNG Up filter: tag 2 + delta vs previous row
            out += b"\x02" + bytes((a - b) & 0xFF for a, b in zip(r, prev))
            prev = r
        return (
            zlib.compress(bytes(out), 6),
            b"/DecodeParms << /Predictor 12 /Columns %d >> " % width,
        )

    if object_streams:
        # split by stream-ness: packed objects may not carry streams
        # (spec 7.5.7), so content/CMap/metadata objects stay top-level
        packed = [
            (i, obj) for i, obj in enumerate(objects, 1) if b"stream\n" not in obj
        ]
        top = [
            (i, obj) for i, obj in enumerate(objects, 1) if b"stream\n" in obj
        ]
        objstm_id = len(objects) + 1
        xref_id = len(objects) + 2
        hdr_parts: list[bytes] = []
        body_parts: list[bytes] = []
        off = 0
        for oid, obj in packed:
            hdr_parts.append(b"%d %d" % (oid, off))
            body_parts.append(obj + b"\n")
            off += len(obj) + 1
        stm_hdr = b" ".join(hdr_parts) + b"\n"
        stm = stm_hdr + b"".join(body_parts)
        stm_z = zlib.compress(stm, 6)
        entry: dict[int, bytes] = {}  # obj id -> xref row
        for k, (oid, _obj) in enumerate(packed):  # type-2: in ObjStm
            entry[oid] = b"\x02" + objstm_id.to_bytes(4, "big") + k.to_bytes(2, "big")
        for oid, obj in top:
            entry[oid] = _t1(len(out))
            out += b"%d 0 obj\n%b\nendobj\n" % (oid, obj)
        entry[objstm_id] = _t1(len(out))
        out += (
            b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d "
            b"/Filter /FlateDecode /Length %d >>\nstream\n%b\nendstream\nendobj\n"
            % (objstm_id, len(packed), len(stm_hdr), len(stm_z), stm_z)
        )
        xref_at = len(out)
        entry[xref_id] = _t1(xref_at)
        rows = [b"\x00" + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")]
        rows += [entry[i] for i in range(1, xref_id + 1)]
        entries, parms = _entry_stream(rows)
        out += (
            b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
            b"%b/Filter /FlateDecode /Length %d >>\nstream\n%b\nendstream\nendobj\n"
            % (xref_id, xref_id + 1, parms, len(entries), entries)
        )
        out += b"startxref\n%d\n%%%%EOF\n" % xref_at
        return bytes(out)

    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%b\nendobj\n" % (i, obj)
    xref_at = len(out)
    if xref_stream:
        # spec 7.5.8: entries are fixed-width binary rows (/W widths,
        # big-endian); object 0 is the type-0 free-list head, every real
        # object a type-1 (uncompressed-at-offset) entry, and the xref
        # stream object indexes ITSELF (its offset is known before the
        # entry bytes are built)
        xref_id = len(objects) + 1
        rows = [b"\x00" + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")]
        for off in offsets[1:] + [xref_at]:
            rows.append(_t1(off))
        entries, parms = _entry_stream(rows)
        out += (
            b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
            b"%b/Filter /FlateDecode /Length %d >>\nstream\n%b\nendstream\nendobj\n"
            % (xref_id, xref_id + 1, parms, len(entries), entries)
        )
        out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    else:
        out += b"xref\n0 %d\n" % (len(objects) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_at)
        )
    return bytes(out)


# ------------------------------------------------------------------
# expected markdown (reading-order spec) for a page model
# ------------------------------------------------------------------

def expected_pdf_page_markdown(page_model: dict[str, Any]) -> str:
    """Markdown the extractor must produce for this page (reading order:
    left column then right; headings by level; lists keep their markers).

    ``cid_noto`` pages expect the EMPTY string: every string operand sits
    under the ToUnicode-less Type0 font, whose code space is unreadable
    without font-embedding analysis — the documented glyph-only fallback
    (suppress, never mis-decode)."""
    if page_model.get("cid_noto"):
        return ""
    cols = page_model.get("columns", 1)
    blocks = page_model["blocks"]
    if cols == 2:
        half = (len(blocks) + 1) // 2
        ordered = blocks[:half] + blocks[half:]
    else:
        ordered = blocks
    md: list[str] = []
    for b in ordered:
        t = b["t"]
        if t == "h":
            md.append("#" * min(b["level"], 3) + " " + b["text"])
        elif t == "p":
            text = " ".join(txt for _, txt in b["spans"]) if "spans" in b else b["text"]
            md.append(" ".join(text.split()))
        elif t == "ul":
            md.append("\n".join(f"- {it}" for it in b["items"]))
        elif t == "ol":
            md.append("\n".join(f"{i + 1}. {it}" for i, it in enumerate(b["items"])))
    return "\n\n".join(m for m in md if m)
