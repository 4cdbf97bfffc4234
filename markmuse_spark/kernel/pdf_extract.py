"""PDF layout-extraction kernel: raw PDF bytes -> per-page Markdown.

From-scratch replacement for the reference's OCR stage over PDF payloads
(``/root/reference/markmuse.py:266-299``): a byte-stream tokenizer over
uncompressed content streams collects absolutely-positioned text runs
``(font_size, x, y, text)``, then box-geometry heuristics reconstruct
reading order and structure:

* **column detection** — x-coordinates clustered; clusters separated by
  >60pt are separate columns, read left to right
* **line/block grouping** — within a column, runs sorted by descending y;
  a vertical gap >20pt or a font-size change starts a new block
* **heading inference** — per-page font-size histogram; the modal size is
  body text, larger sizes map to heading levels by size ratio
  (>=2.2x -> h1, >=1.7x -> h2, >=1.35x -> h3)
* **list detection** — blocks whose lines all carry ``- `` / ``1. ``
  markers are kept line-per-item; other blocks re-join wrapped lines

Dialect (matching :mod:`markmuse_spark.sources.pdf_writer`, SURVEY.md §7
risk 2, extended round 2 toward the real-corpus baseline): plain AND
FlateDecode-compressed content streams (``/Length``-delimited, zlib),
``Tf``/``Tm`` positioning, both ``Tj`` literal strings and kerned ``TJ``
arrays (inter-word space recovered from adjustments <= -150 milli-em),
UTF-8 bytes inside literal strings, UTF-8 and BOM-prefixed UTF-16BE hex
strings (the spec 7.9.2.2 Unicode text-string form — corpus v4), content
streams in page order.  Real-corpus gaps that remain out of dialect:
ToUnicode CMaps with arbitrary CID mappings, cross-reference streams,
object streams (neither affects this extractor's linear content-stream
scan: ObjStm cannot contain stream objects, and page dicts are ignored).
"""

from __future__ import annotations

import re
import zlib
from collections import Counter
from typing import Any

# a stream-bearing object: simple (non-nested) dict immediately followed by
# the stream keyword — /Length delimits the exact payload so compressed
# bytes that happen to contain "endstream" can't truncate the slice
_STREAM_HDR = re.compile(rb"<<([^<>]*)>>\s*stream\r?\n")
_LENGTH = re.compile(rb"/Length\s+(\d+)")
_FLATE = re.compile(rb"/Filter\s*/FlateDecode")
_ENDSTREAM = re.compile(rb"\r?\n?endstream")
_OP = re.compile(
    r"/F\d+\s+(\d+(?:\.\d+)?)\s+Tf"
    r"|1 0 0 1\s+(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+Tm"
    r"|\(((?:[^()\\]|\\.)*)\)\s*Tj"
    r"|<([0-9A-Fa-f\s]*)>\s*Tj"
    r"|\[((?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|[^\[\]()<>])*)\]\s*TJ"
)
_TJ_PIECE = re.compile(
    r"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>|(-?\d+(?:\.\d+)?)"
)
_UNESCAPE = re.compile(r"\\([\\()])")
_LIST_LINE = re.compile(r"^(?:- |\d+\. )")

_COLUMN_GAP = 60.0
_LINE_GAP = 20.0
# a TJ adjustment at/below this (milli-em, negative = widen) is a word space
_TJ_SPACE_ADJ = -150.0


def _decode_pdf_string(raw: str) -> str:
    """Literal-string unescape, then recover UTF-8 from the latin-1 view."""
    s = _UNESCAPE.sub(r"\1", raw) if "\\" in raw else raw
    if s.isascii():  # fast path: ASCII round-trips identically
        return s
    try:
        return s.encode("latin-1").decode("utf-8")
    except (UnicodeDecodeError, UnicodeEncodeError):
        return s


def _decode_hex_string(raw: str) -> str:
    """Hex string ``<48656C6C6F>``: whitespace-tolerant, odd length padded
    with 0 (PDF spec 7.3.4.3).  Bytes beginning with the U+FEFF BOM are
    the spec 7.9.2.2 Unicode text-string form (UTF-16BE — corpus v4, the
    encoding real producers emit for non-WinAnsi text); otherwise the
    writer's UTF-8, with latin-1 as the never-fails fallback."""
    h = "".join(raw.split())
    if len(h) % 2:
        h += "0"
    try:
        b = bytes.fromhex(h)
    except ValueError:
        return ""
    if b.startswith(b"\xfe\xff"):
        try:
            return b[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            pass  # malformed UTF-16 body: fall through to the byte paths
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _tj_text(body: str) -> str:
    """Concatenate a TJ array's string pieces, re-inserting word spaces
    for adjustments <= -150 (the kerned-text word gap).

    ``findall`` (tuples) instead of ``finditer`` (match objects): the TJ
    path runs once per kerned line — measurably cheaper.  An empty string
    piece ``()`` yields ``('', '')`` and falls through to the string
    branch, appending '' (harmless and order-preserving)."""
    parts: list[str] = []
    for s, hx, num in _TJ_PIECE.findall(body):
        if num:
            if float(num) <= _TJ_SPACE_ADJ:
                parts.append(" ")
        elif hx:
            parts.append(_decode_hex_string(hx))
        else:
            parts.append(_decode_pdf_string(s))
    return "".join(parts)


def _parse_runs(stream: str) -> list[tuple[float, float, float, str]]:
    runs: list[tuple[float, float, float, str]] = []
    size = 10.0
    x = y = 0.0
    for m in _OP.finditer(stream):
        # dispatch on lastindex (Tf->1, Tm->3, Tj->4, hex-Tj->5, TJ->6):
        # one attribute read instead of 2-3 group() calls per token
        li = m.lastindex
        if li == 4:
            text = _decode_pdf_string(m[4])
            if text:
                runs.append((size, x, y, text))
        elif li == 3:
            x, y = float(m[2]), float(m[3])
        elif li == 1:
            size = float(m[1])
        elif li == 5:
            text = _decode_hex_string(m[5])
            if text:
                runs.append((size, x, y, text))
        else:
            text = _tj_text(m[6])
            if text:
                runs.append((size, x, y, text))
    return runs


def _content_streams(payload: bytes) -> list[str]:
    """All content streams, decompressed, in document order.

    ``/Length`` (when present and consistent) delimits the payload slice —
    required for Flate streams whose compressed bytes may contain the
    ``endstream`` keyword; otherwise fall back to scanning for it.
    """
    streams: list[str] = []
    pos = 0
    # scan position advances past each consumed stream's endstream so
    # stream BODIES are never rescanned: Flate-compressed bytes can
    # contain '<<...>>stream\n' by chance, and a finditer over the whole
    # payload would mint a garbage page from it (silently shifting page
    # indices) instead of skipping it
    while True:
        m = _STREAM_HDR.search(payload, pos)
        if m is None:
            break
        head, start = m.group(1), m.end()
        lm = _LENGTH.search(head)
        data: bytes | None = None
        pos = m.end()
        if lm:
            end = start + int(lm.group(1))
            em = _ENDSTREAM.match(payload, end)
            if em:
                data = payload[start:end]
                pos = em.end()
        if data is None:  # no/odd /Length: scan (uncompressed dialect only)
            idx = payload.find(b"endstream", start)
            if idx < 0:
                continue
            data = payload[start:idx].rstrip(b"\r\n")
            pos = idx + len(b"endstream")
        if _FLATE.search(head):
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(f"bad FlateDecode stream: {exc}") from exc
        streams.append(data.decode("latin-1"))
    return streams


def _cluster_columns(runs: list[tuple[float, float, float, str]]) -> list[list[tuple[float, float, float, str]]]:
    xs = sorted({r[1] for r in runs})
    col_starts: list[float] = []
    for v in xs:
        if not col_starts or v - col_starts[-1] > _COLUMN_GAP:
            col_starts.append(v)
    cols: list[list[tuple[float, float, float, str]]] = [[] for _ in col_starts]
    for r in runs:
        # assign to the rightmost column start <= x
        idx = 0
        for i, cs in enumerate(col_starts):
            if r[1] >= cs - 1e-6:
                idx = i
        cols[idx].append(r)
    return cols


def _heading_level(size: float, body: float) -> int:
    r = size / body if body else 1.0
    if r >= 2.2:
        return 1
    if r >= 1.7:
        return 2
    if r >= 1.35:
        return 3
    return 0


def _column_blocks(
    col: list[tuple[float, float, float, str]], body_size: float
) -> list[str]:
    """Lines (sorted top-down; same-y runs merged left-to-right) -> blocks."""
    by_y: dict[float, list[tuple[float, str]]] = {}
    sizes: dict[float, float] = {}
    for size, x, y, text in col:
        by_y.setdefault(y, []).append((x, text))
        sizes[y] = max(sizes.get(y, 0.0), size)
    lines = []
    for y in sorted(by_y, reverse=True):
        text = " ".join(t for _, t in sorted(by_y[y]))
        lines.append((y, sizes[y], text))

    blocks: list[str] = []
    cur: list[str] = []
    cur_size = None
    prev_y = None

    def _flush() -> None:
        nonlocal cur, cur_size
        if not cur:
            return
        level = _heading_level(cur_size, body_size) if cur_size else 0
        if level:
            blocks.append("#" * level + " " + " ".join(cur))
        elif all(_LIST_LINE.match(ln) for ln in cur):
            blocks.append("\n".join(cur))
        else:
            blocks.append(" ".join(cur))
        cur = []
        cur_size = None

    for y, size, text in lines:
        new_block = (
            prev_y is not None and (prev_y - y) > _LINE_GAP
        ) or (cur_size is not None and size != cur_size)
        if new_block or _heading_level(size, body_size):
            _flush()
        cur.append(text)
        cur_size = size
        prev_y = y
        if _heading_level(size, body_size):
            _flush()
            prev_y = None  # heading gap shouldn't merge next block
    _flush()
    return blocks


def extract_pages(payload: bytes) -> list[dict[str, Any]]:
    """Extract the page list (ocr_pages shape) from one PDF payload."""
    if not payload:
        raise ValueError("empty payload")
    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF payload")
    pages: list[dict[str, Any]] = []
    streams = _content_streams(payload)
    if not streams:
        raise ValueError("no content streams")
    for page_idx, stream in enumerate(streams):
        runs = _parse_runs(stream)
        if not runs:
            pages.append({"page_idx": page_idx, "markdown": "", "images": []})
            continue
        counts = Counter(r[0] for r in runs)
        top = max(counts.values())
        body_size = min(s for s, c in counts.items() if c == top)
        blocks: list[str] = []
        for col in _cluster_columns(runs):
            if col:
                blocks.extend(_column_blocks(col, body_size))
        pages.append(
            {"page_idx": page_idx, "markdown": "\n\n".join(blocks), "images": []}
        )
    return pages
