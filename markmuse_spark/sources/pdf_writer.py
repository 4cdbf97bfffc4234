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

import base64
import binascii
import hashlib
import re
import zlib
from typing import Any

PAGE_W, PAGE_H = 612, 792
MARGIN_TOP = 720
FORM_Y = 756  # letterhead line: above MARGIN_TOP by > the extractor's
# block gap, so the form's text reads as its own leading block
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


# corpus v13: the /Differences block remaps these typographic chars to
# LOW byte codes (16..23) — their natural cp1252 positions would also
# decode through the base encoding alone, proving nothing; at 16..23 a
# reader MUST honor the Differences array or emit U+FFFD garbage
_DIFF_NAMES = (
    (16, "quotedblleft", "“"),
    (17, "quotedblright", "”"),
    (18, "emdash", "—"),
    (19, "ellipsis", "…"),
    (20, "Euro", "€"),
    (21, "oe", "œ"),
    (22, "OE", "Œ"),
    (23, "germandbls", "ß"),
)
_WINANSI_DIFF_ARR = b"/Differences [ 16 " + b" ".join(
    b"/" + n.encode() for _c, n, _ch in _DIFF_NAMES
) + b" ]"
_WINANSI_CODE_OF: dict[str, int] = {}
for _code in range(32, 256):
    try:
        _WINANSI_CODE_OF.setdefault(bytes([_code]).decode("cp1252"), _code)
    except UnicodeDecodeError:
        pass
for _c, _n, _ch in _DIFF_NAMES:  # Differences codes override: exercise them
    _WINANSI_CODE_OF[_ch] = _c

# corpus v14.1: MacRomanEncoding as a BARE /Encoding name (no dict, no
# Differences) — the other common declared-encoding form; built from the
# mac_roman codec like the extractor builds its decode table
_MACROMAN_CODE_OF: dict[str, int] = {}
for _code in range(32, 256):
    try:
        _MACROMAN_CODE_OF.setdefault(bytes([_code]).decode("mac_roman"), _code)
    except UnicodeDecodeError:
        pass


# corpus v14: Type3 glyph names.  The writer stays INDEPENDENT of the
# kernel's AGL module (fixture-vs-extractor independence is the oracle
# argument), so it carries its own tiny name table for the common chars
# and falls back to the algorithmic /uniXXXX form for everything else —
# exercising BOTH of the extractor's name-resolution paths.
_T3_NAME_OF = {c: c for c in
               "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"}
_T3_NAME_OF.update({
    "0": "zero", "1": "one", "2": "two", "3": "three", "4": "four",
    "5": "five", "6": "six", "7": "seven", "8": "eight", "9": "nine",
    " ": "space", ".": "period", ",": "comma", "-": "hyphen",
    "!": "exclam", "?": "question", ":": "colon", ";": "semicolon",
})


def _t3_glyph_name(ch: str) -> str:
    name = _T3_NAME_OF.get(ch)
    if name is not None:
        return name
    cp = ord(ch)
    if cp > 0xFFFF:
        raise ValueError(f"char {ch!r} outside the Type3 dialect (non-BMP)")
    return "uni%04X" % cp


# corpus v16: page rotation.  A rotated scan carries a LANDSCAPE
# MediaBox plus /Rotate, and the viewer turns it upright; the writer
# lays text out in the standard visual portrait space and maps the
# coordinates into page space with the INVERSE of the display rotation,
# so the extractor's forward transform recovers the visual layout
# byte-exactly.  MediaBox per rotation: 90/270 swap the page sides.
_ROTATE_BOX = {
    90: (PAGE_H, PAGE_W),
    180: (PAGE_W, PAGE_H),
    270: (PAGE_H, PAGE_W),
}


def _unrotate_runs(
    runs: list[tuple[int, int, int, str]], rot: int
) -> list[tuple[int, int, int, str]]:
    """Visual-space runs -> page-space runs for a /Rotate page (the
    inverse of the viewer's clockwise rotation)."""
    w, h = _ROTATE_BOX[rot]
    if rot == 90:  # forward: (x,y) -> (y, W-x); inverse below
        return [(s, w - y, x, t) for s, x, y, t in runs]
    if rot == 180:
        return [(s, w - x, h - y, t) for s, x, y, t in runs]
    if rot == 270:  # forward: (x,y) -> (H-y, x)
        return [(s, y, h - x, t) for s, x, y, t in runs]
    return runs


def _coded_string(text: str, code_of: dict[str, int], octal: bool) -> bytes:
    """One literal string of BYTE CODES through a declared encoding;
    with ``octal``, non-printable/high codes emit as ``\\2xx`` escapes
    (the form WinAnsi-era producers write) instead of raw bytes."""
    out = bytearray(b"(")
    for ch in text:
        code = code_of.get(ch)
        if code is None:
            raise ValueError(f"char {ch!r} not encodable in this encoding")
        if code in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([code])
        elif octal and (code < 32 or code > 126):
            out += b"\\%03o" % code
        else:
            out.append(code)
    out += b")"
    return bytes(out)


def _coded_content_stream(
    runs: list[tuple[int, int, int, str]],
    use_tj: bool,
    code_of: dict[str, int],
    font: bytes,
) -> bytes:
    """Content stream under a declared-encoding font (/F4 WinAnsi —
    corpus v13 — or /F5 Type3 — corpus v14): every string operand is
    byte codes, alternating raw-byte and octal-escape emission per run
    so both spellings are corpus-exercised."""
    parts = []
    for k, (size, x, y, text) in enumerate(runs):
        octal = bool(k % 2)
        if use_tj and " " in text:
            words = text.split(" ")
            pieces = []
            for j, w in enumerate(words):
                if j:
                    pieces.append(b"-250")
                pieces.append(_coded_string(w, code_of, octal))
            parts.append(
                b"BT /%b %d Tf 1 0 0 1 %d %d Tm [%b] TJ ET"
                % (font, size, x, y, b" ".join(pieces))
            )
        else:
            parts.append(
                b"BT /%b %d Tf 1 0 0 1 %d %d Tm %b Tj ET"
                % (font, size, x, y, _coded_string(text, code_of, octal))
            )
    return b"\n".join(parts)


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
    invisible: bool = False,
) -> bytes:
    # ``invisible`` (corpus v15.1): text render mode 3 (spec 9.3.6) — the
    # form OCR software stamps under scanned page images; the glyphs
    # paint nothing but ARE the document text
    tr = b"3 Tr " if invisible else b""
    parts = []
    for size, x, y, text in runs:
        if use_tj and " " in text:
            parts.append(
                b"BT /F1 %d Tf %b1 0 0 1 %d %d Tm %b TJ ET"
                % (size, tr, x, y, _tj_array(text, use_hex, bom16))
            )
        elif use_hex:
            parts.append(
                b"BT /F1 %d Tf %b1 0 0 1 %d %d Tm %b Tj ET"
                % (size, tr, x, y, _hex_string(text, bom16))
            )
        else:
            parts.append(
                b"BT /F1 %d Tf %b1 0 0 1 %d %d Tm (%b) Tj ET"
                % (size, tr, x, y, _escape(text))
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


def _lzw_encode(data: bytes) -> bytes:
    """LZWDecode-compatible encoder (spec 7.4.4.2, EarlyChange=1):
    9->12-bit big-endian codes, clear=256 first and on table overflow,
    EOD=257 last.  Width grows when the NEXT code to assign reaches the
    current width's capacity (512/1024/2048) — the decoder, one table
    entry behind, mirrors this at 511/1023/2047."""
    codes: list[tuple[int, int]] = [(256, 9)]
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        if next_code == 4096:  # table full: clear and restart
            codes.append((256, 12))
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        elif next_code >= (1 << width) and width < 12:
            width += 1
        w = bytes([b])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    buf = nbits = 0
    out = bytearray()
    for code, cw in codes:
        buf = (buf << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rl_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder (spec 7.4.5): repeat runs of
    >=2 as (257-n, byte), literals in <=128-byte chunks, EOD 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
            ):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def _filter_stream(stream: bytes, page: dict[str, Any]) -> tuple[bytes, bytes]:
    """(encoded bytes, /Filter declaration) for one content stream —
    the per-page ``filters`` knob (corpus v10) wins over ``compress``."""
    filt = page.get("filters")
    if filt == "lzw":
        return _lzw_encode(stream), b"/Filter /LZWDecode "
    if filt == "a85_flate":
        # the classic PostScript-era chain: decode order A85 then Flate
        return (
            base64.a85encode(zlib.compress(stream, 6)) + b"~>",
            b"/Filter [/ASCII85Decode /FlateDecode] ",
        )
    if filt == "rl":
        return _rl_encode(stream), b"/Filter /RunLengthDecode "
    if filt == "ahx":
        return binascii.hexlify(stream) + b">", b"/Filter /ASCIIHexDecode "
    if page.get("compress"):
        return zlib.compress(stream, 6), b"/Filter /FlateDecode "
    return stream, b""


# an inline image (spec 8.9.7) whose 3x2 RGB sample bytes deliberately
# parse as a text operator — "(trap)Tj" becomes a phantom run in any
# extractor that tokenizes BI..EI data as page text (corpus v10)
_INLINE_IMAGE = b"BI /W 3 /H 2 /CS /RGB /BPC 8 ID\n(trap)Tj 1 0 0 1 9\nEI\n"

# the Standard security handler's 32-byte password pad (spec alg. 2)
_PW_PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa01082e2e00b6d0683e802f0ca9fe6453697a"
)


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_security(file_id: bytes, p: int) -> tuple[bytes, bytes, bytes]:
    """(file key, /O, /U) for the Standard handler, R3/V2 128-bit RC4,
    empty user AND owner passwords (spec algorithms 2, 3, 5)."""
    h = hashlib.md5(_PW_PAD).digest()
    for _ in range(50):
        h = hashlib.md5(h[:16]).digest()
    okey = h[:16]
    o = _PW_PAD
    for i in range(20):
        o = _rc4(bytes(b ^ i for b in okey), o)
    h = hashlib.md5(
        _PW_PAD + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + file_id
    ).digest()
    for _ in range(50):
        h = hashlib.md5(h[:16]).digest()
    key = h[:16]
    u = _rc4(key, hashlib.md5(_PW_PAD + file_id).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return key, o, u + bytes(16)


_OBJ_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def _aesv3_security(
    file_id: bytes, p: int, r: int
) -> tuple[bytes, bytes, bytes, bytes, bytes, bytes]:
    """(file key, /O, /U, /OE, /UE, /Perms) for the AES-256 Standard
    handler (V5, revision ``r`` in {5, 6}), empty user AND owner
    passwords (ISO 32000-2 §7.6.4.4.6-8).  All salts and the file key
    are deterministic functions of ``file_id`` so corpus bytes stay a
    pure function of (seed, row).  The cipher itself comes from the
    kernel's FIPS-KAT-pinned module — AES is a public standard, not
    extraction semantics, so sharing the primitive does not couple the
    content oracle to the code under test."""
    from markmuse_spark.kernel import aes

    def _tag(name: bytes, n: int) -> bytes:
        return hashlib.sha256(b"markmuse:v11:" + name + b":" + file_id).digest()[:n]

    filekey = _tag(b"filekey", 32)
    vs_u, ks_u = _tag(b"vsu", 8), _tag(b"ksu", 8)
    u_val = aes.pdf2_hash(b"", vs_u, b"", r) + vs_u + ks_u
    ue = aes.cbc_encrypt(aes.pdf2_hash(b"", ks_u, b"", r), bytes(16), filekey)
    vs_o, ks_o = _tag(b"vso", 8), _tag(b"kso", 8)
    o_val = aes.pdf2_hash(b"", vs_o, u_val, r) + vs_o + ks_o
    oe = aes.cbc_encrypt(aes.pdf2_hash(b"", ks_o, u_val, r), bytes(16), filekey)
    perms = aes.ecb_encrypt(
        filekey,
        (p & 0xFFFFFFFF).to_bytes(4, "little") + b"\xff\xff\xff\xff"
        + b"Tadb" + _tag(b"perms", 4),
    )
    return filekey, o_val, u_val, oe, ue, perms


def _stream_cipher(cipher: str, file_key: bytes, file_id: bytes):
    """``fn(num, data) -> bytes`` transforming one raw stream body.

    RC4 is length-preserving; the AES forms prepend a deterministic
    per-object IV and CBC-encrypt with PKCS#7 padding (ISO 32000
    §7.6.3), so callers must re-derive /Length from the result."""
    from markmuse_spark.kernel import aes

    if cipher == "rc4":

        def fn(num: int, data: bytes) -> bytes:
            okey = hashlib.md5(
                file_key + num.to_bytes(3, "little") + b"\x00\x00"
            ).digest()[: min(len(file_key) + 5, 16)]
            return _rc4(okey, data)

    else:

        def fn(num: int, data: bytes) -> bytes:
            if cipher == "aesv2":
                okey = hashlib.md5(
                    file_key + num.to_bytes(3, "little") + b"\x00\x00" + b"sAlT"
                ).digest()[:16]
            else:  # aesv3: the file key directly (spec: no per-object step)
                okey = file_key
            iv = hashlib.md5(b"iv:%d:" % num + file_id).digest()
            pad = 16 - len(data) % 16
            return iv + aes.cbc_encrypt(okey, iv, data + bytes([pad]) * pad)

    return fn


_ANNOT_STR_RE = re.compile(rb"/Contents\s*\(((?:[^()\\]|\\.)*)\)", re.S)
_UNESC_RE = re.compile(rb"\\(.)", re.S)


def _encrypt_obj_streams(
    obj: bytes, num: int, fn, strings: bool = True
) -> bytes:
    """Apply the cipher to the stream span of one object body,
    re-deriving /Length when the cipher changed the byte count (AES) —
    and, with ``strings``, to annotation ``/Contents`` strings (spec
    7.6.2: EVERY string encrypts with the object's key, not just
    streams), re-emitted as hex ciphertext so parenthesis-significant
    ciphertext bytes need no escaping.  ``strings=False`` is the
    object-streams mode: a dict packed into an /ObjStm is protected by
    the ObjStm's OWN stream encryption and its strings stay plaintext
    within (spec 7.5.7) — encrypting them individually too would be
    double encryption, which no conforming reader survives."""
    idx = obj.find(b"stream\n")
    if idx < 0:
        if strings and b"/Type /Annot" in obj:
            m = _ANNOT_STR_RE.search(obj)
            if m:
                raw = _UNESC_RE.sub(lambda mm: mm.group(1), m.group(1))
                enc = fn(num, raw)
                obj = (
                    obj[: m.start()]
                    + b"/Contents <"
                    + enc.hex().upper().encode()
                    + b">"
                    + obj[m.end():]
                )
        return obj
    start = idx + len(b"stream\n")
    end = start + int(_OBJ_LENGTH_RE.search(obj).group(1))
    data = fn(num, obj[start:end])
    head = obj[:idx]
    if len(data) != end - start:
        head = _OBJ_LENGTH_RE.sub(b"/Length %d" % len(data), head, count=1)
    return head + b"stream\n" + data + obj[end:]


def write_pdf(
    pages: list[dict[str, Any]],
    metadata: bool = False,
    xref_stream: bool = False,
    object_streams: bool = False,
    xref_predictor: bool = False,
    encrypt: bool = False,
    hybrid_xref: bool = False,
    corrupt_page_idx: "int | None" = None,
    incremental_update_page: "int | None" = None,
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
    * ``"filters": "lzw" | "a85_flate" | "rl" | "ahx"`` (corpus v10) —
      the content stream's filter form, overriding ``compress``:
      ``/LZWDecode`` (pre-Flate Distiller era), the classic
      ``[/ASCII85Decode /FlateDecode]`` chain, ``/RunLengthDecode``, or
      ``/ASCIIHexDecode``
    * ``"inline_image": True`` (corpus v10) — the content stream opens
      with a ``BI..ID..EI`` inline image (spec 8.9.7) whose 18 sample
      bytes deliberately read as ``(trap)Tj``: an extractor that
      tokenizes the opaque data as page text mints a phantom run
    * ``"winansi": True`` (corpus v13) — the page uses /F4, a simple
      Type1 font with a DECLARED ``/Encoding``: ``/BaseEncoding
      /WinAnsiEncoding`` overlaid by a ``/Differences`` block that
      remaps typographic chars (curly quotes, em-dash, ellipsis, euro,
      ligatures, eszett) to LOW codes 16..23 — the pdflatex/office-era
      wild form.  String operands are BYTE CODES through that table
      (emitted alternately as raw bytes and ``\\2xx`` octal escapes),
      not UTF-8: a reader must honor the base encoding AND the
      Differences array (resolving glyph names through the Adobe Glyph
      List) or it mints mojibake.  Mutually exclusive with
      ``cid``/``cid_noto``/``hex``/``hex16``
    * ``"macroman": True`` (corpus v14.1) — the page uses /F6, a simple
      font whose ``/Encoding`` is the BARE NAME ``/MacRomanEncoding``
      (no dict, no Differences — the other common declared-encoding
      spelling); string operands are mac_roman byte codes.  Mutually
      exclusive with the same knobs as ``winansi``
    * ``"type3": True`` (corpus v14) — the page uses /F5, a TYPE3 font
      (spec 9.6.5, the dvips/bitmap era): one shared document font whose
      every used char has a ``/CharProcs`` glyph-procedure stream and a
      ``/Differences`` code starting at 32.  No base encoding, no
      ToUnicode — Differences -> glyph name (common AGL names and
      ``/uniXXXX`` forms both emitted) is the ONLY decode path, and the
      glyph procedures are opaque drawing streams that must never
      become text or pages.  Document-level in practice: the corpus
      stamps every page of a doc or none
    * ``"ocr_layer": True`` (corpus v15.1) — the page is a SCANNED-PAGE
      form: a full-page DCTDecode image XObject paints first (`/Im0
      Do` — opaque pixels this engine must never decode or tokenize),
      then the page's text renders in MODE 3 (``3 Tr``, spec 9.3.6 —
      paints nothing).  This is exactly what OCR software emits for
      scanned documents: the invisible layer IS the document text and
      must extract identically to a visible page.  Plain-font pages
      only (OCR output uses simple fonts)
    * ``"annot_text": str`` (corpus v15) — the page carries a visible
      FREETEXT ANNOTATION (spec 12.5.6.6): a margin-note box below the
      lowest body run, its text in the annotation dict's ``/Contents``
      string (NOT in any content stream).  A rendering pipeline — the
      reference OCRs rendered pages — reads the visible box as page
      text, so the note is the page's final markdown block; an
      extractor that only tokenizes content streams drops it.  On an
      ENCRYPTED document the /Contents string is ciphertext under the
      annotation object's key (spec 7.6.2 — every string encrypts),
      emitted as a hex string; a conforming reader must decrypt it
      with the STRING filter, and one that reads it raw mints salad
    * ``"form_text": str`` (corpus v12) — the page invokes a FORM
      XOBJECT letterhead (spec 8.10): one shared ``/Subtype /Form``
      stream per distinct text, Flate-compressed, referenced from the
      page's ``/Resources /XObject`` and drawn via ``/Fm1 Do`` at the
      head of the content stream.  The form's font (``/F9``) is declared
      ONLY in the form's own ``/Resources`` — an extractor that resolves
      fonts purely from the page dict drops the stamp; one that
      tokenizes without splicing reads a bare ``/Fm1 Do`` and must mint
      nothing.  The stamp line sits above the body margin, so it reads
      as the page's leading block (and on a glyph-only ``cid_noto``
      page it is the page's ONLY readable text)

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

    ``encrypt`` (corpus v10): RC4-encrypt every stream body with the
    Standard security handler (V2/R3, 128-bit, EMPTY user and owner
    passwords — the dominant wild encrypted-PDF form): computes /O and
    /U per spec algorithms 3/5, derives the file key per algorithm 2,
    and RC4s each stream span with its per-object key (algorithm 1 —
    length-preserving, so offsets and /Length stay valid); the trailer
    gains ``/Encrypt N 0 R`` and a deterministic ``/ID``.  Dialect
    constraint (documented): requires the classic xref table, matching
    the wild population where Standard-RC4 files are pre-PDF-1.5.

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
    any_winansi = any(p.get("winansi") for p in pages)
    charset = _cid_charset(pages, runs_by_page) if any_cid or any_noto else []
    cid_of = {c: k + 1 for k, c in enumerate(charset)}

    objects: list[bytes] = []
    n_pages = len(pages)
    next_id = 4
    f2_id = f3_id = f4_id = cmap_id = meta_id = None
    if any_cid:
        f2_id, cmap_id = next_id, next_id + 1
        next_id += 2
    if any_noto:
        f3_id = next_id
        next_id += 1
    if any_winansi:
        f4_id = next_id
        next_id += 1
    any_macroman = any(p.get("macroman") for p in pages)
    f6_id = None
    if any_macroman:
        f6_id = next_id
        next_id += 1
    any_type3 = any(p.get("type3") for p in pages)
    t3_code_of: dict[str, int] = {}
    t3_charset: list[str] = []
    f5_id = None
    t3_proc_ids: dict[str, int] = {}
    if any_type3:
        t3_charset = sorted({
            ch
            for p, runs in zip(pages, runs_by_page)
            if p.get("type3")
            for _s, _x, _y, t in runs
            for ch in t
        })
        if len(t3_charset) > 224:  # codes 32..255
            raise ValueError("Type3 charset exceeds one byte of codes")
        t3_code_of = {ch: 32 + k for k, ch in enumerate(t3_charset)}
        f5_id = next_id
        next_id += 1
        t3_proc_ids = {
            ch: f5_id + 1 + k for k, ch in enumerate(t3_charset)
        }
        next_id += len(t3_charset)
    if metadata:
        meta_id = next_id
        next_id += 1
    # corpus v12: one Form XObject per DISTINCT letterhead text, in
    # first-appearance order — global stream objects like the CMap, so
    # the 2-objects-per-page arithmetic below is untouched
    form_texts: list[str] = []
    for p in pages:
        ft = p.get("form_text")
        if ft and ft not in form_texts:
            form_texts.append(ft)
    form_ids = {}
    for ft in form_texts:
        form_ids[ft] = next_id
        next_id += 1
    # corpus v15: one FreeText annotation object per annotated page —
    # global non-stream objects (ObjStm packs them in that mode), so the
    # 2-objects-per-page arithmetic below is untouched.  The note sits
    # BELOW the page's lowest text run so it reads as the final block.
    annot_ids: dict[int, int] = {}
    for idx, p in enumerate(pages):
        if p.get("annot_text"):
            annot_ids[idx] = next_id
            next_id += 1
    # corpus v15.1: one shared full-page scanned-image XObject for the
    # OCR-layer pages (DCTDecode — an image codec this engine must treat
    # as opaque: its Do draws pixels, never text)
    any_ocr = any(p.get("ocr_layer") for p in pages)
    img_id = None
    if any_ocr:
        img_id = next_id
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
    if any_winansi:
        # corpus v13: a simple font with a DECLARED encoding — WinAnsi
        # base plus a /Differences block remapping typographic chars to
        # low codes; string operands under /F4 are byte codes, not UTF-8
        objects.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
            b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            b"%b >> >>" % _WINANSI_DIFF_ARR
        )
    if any_macroman:
        # corpus v14.1: the BARE-NAME declared-encoding form — no dict,
        # no Differences, just /Encoding /MacRomanEncoding on a simple
        # font; string operands are mac_roman byte codes
        objects.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /MacRomanEncoding >>"
        )
    if any_type3:
        # corpus v14: a TYPE3 font (spec 9.6.5) — the dvips/bitmap-era
        # form where the entire document renders through custom glyph
        # procedures.  Every used char gets a /CharProcs stream and a
        # /Differences code; there is no base encoding and no ToUnicode:
        # the ONLY decode path is Differences -> glyph name -> AGL (or
        # /uniXXXX), exactly what the extractor's encoding table does
        names = [_t3_glyph_name(ch) for ch in t3_charset]
        charprocs = b" ".join(
            b"/%b %d 0 R" % (n.encode(), t3_proc_ids[ch])
            for n, ch in zip(names, t3_charset)
        )
        diffs = b"/Differences [ 32 " + b" ".join(
            b"/" + n.encode() for n in names
        ) + b" ]"
        widths = b" ".join(b"500" for _ in t3_charset)
        objects.append(
            b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 1000 1000] "
            b"/FontMatrix [0.001 0 0 0.001 0 0] /CharProcs << %b >> "
            b"/Encoding << /Type /Encoding %b >> "
            b"/FirstChar 32 /LastChar %d /Widths [%b] >>"
            % (charprocs, diffs, 31 + len(t3_charset), widths)
        )
        for ch in t3_charset:
            # a minimal glyph procedure: width declaration + one stroke
            # (opaque drawing ops the extractor must never read as text)
            proc = b"500 0 d0\n10 10 m 490 700 l S"
            objects.append(
                b"<< /Length %d >>\nstream\n%b\nendstream" % (len(proc), proc)
            )
    if metadata:
        objects.append(
            b"<< /Type /Metadata /Subtype /XML /Length %d >>\nstream\n%b\nendstream"
            % (len(_XMP_METADATA), _XMP_METADATA)
        )
    for ft in form_texts:
        # the form's font is declared ONLY in its own /Resources: the
        # extractor must merge form-scoped resources, not just the
        # page's, to resolve the /F9 Tf inside
        body = b"BT /F9 %d Tf 1 0 0 1 %d %d Tm (%b) Tj ET" % (
            BODY_SIZE,
            COL_X[1][0],
            FORM_Y,
            _escape(ft),
        )
        data = zlib.compress(body, 6)
        objects.append(
            b"<< /Type /XObject /Subtype /Form /BBox [0 0 %d %d] "
            b"/Resources << /Font << /F9 3 0 R >> >> /Filter /FlateDecode "
            b"/Length %d >>\nstream\n%b\nendstream"
            % (PAGE_W, PAGE_H, len(data), data)
        )
    for idx, aid in annot_ids.items():
        note = pages[idx]["annot_text"]
        y = min(
            (r[2] for r in runs_by_page[idx]), default=MARGIN_TOP
        ) - 40  # below the lowest body run: the note is the final block
        objects.append(
            b"<< /Type /Annot /Subtype /FreeText /Rect [%d %d 540 %d] "
            b"/Contents (%b) /DA (/Helv 10 Tf) /F 4 >>"
            % (COL_X[1][0], y, y + 20, _escape(note))
        )
    if any_ocr:
        # deterministic fake JPEG: valid SOI/EOI markers, opaque middle
        jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF" + bytes(
            (i * 37 + 11) & 0xFF for i in range(160)
        ) + b"\xff\xd9"
        objects.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            b"/Filter /DCTDecode /Length %d >>\nstream\n%b\nendstream"
            % (PAGE_W, PAGE_H, len(jpeg), jpeg)
        )
    if incremental_update_page is not None and (
        xref_stream or object_streams or encrypt or hybrid_xref
        or corrupt_page_idx is not None
    ):
        # dialect constraint (documented): the appended-update tail below
        # is the CLASSIC-table form; combining it with the other damage
        # draws would make the expected markdown ambiguous
        raise ValueError(
            "incremental_update_page requires the plain classic-xref dialect"
        )
    if incremental_update_page is not None and not (
        0 <= incremental_update_page < len(pages)
    ):
        raise ValueError("incremental_update_page out of range")
    true_update_obj = b""  # set in the page loop when the draw applies

    for i, page in enumerate(pages):
        content_num = first_page_id + 2 * i + 1
        font_res = b"/F1 3 0 R"
        if page.get("cid"):
            font_res = b"/F1 3 0 R /F2 %d 0 R" % f2_id
        elif page.get("cid_noto"):
            font_res = b"/F1 3 0 R /F3 %d 0 R" % f3_id
        elif page.get("winansi"):
            font_res = b"/F1 3 0 R /F4 %d 0 R" % f4_id
        elif page.get("macroman"):
            font_res = b"/F1 3 0 R /F6 %d 0 R" % f6_id
        elif page.get("type3"):
            font_res = b"/F5 %d 0 R" % f5_id
        rot = int(page.get("rotate", 0))
        if rot not in (0, 90, 180, 270):
            raise ValueError(f"unsupported /Rotate value {rot}")
        if rot and (
            page.get("form_text")
            or page.get("annot_text")
            or page.get("ocr_layer")
        ):
            # form/annot/image boxes are placed in fixed visual coords;
            # combining them with rotation is out of dialect (fixture
            # bug, not a silent skip)
            raise ValueError("rotate does not combine with form/annot/ocr")
        page_w, page_h = _ROTATE_BOX.get(rot, (PAGE_W, PAGE_H))
        page_runs_i = (
            _unrotate_runs(runs_by_page[i], rot) if rot else runs_by_page[i]
        )
        xobj_entries = b""
        ft = page.get("form_text")
        if ft:
            xobj_entries += b"/Fm1 %d 0 R " % form_ids[ft]
        if page.get("ocr_layer"):
            xobj_entries += b"/Im0 %d 0 R " % img_id
        xobj_res = (
            b" /XObject << %b>>" % xobj_entries if xobj_entries else b""
        )
        annots_entry = b""
        if i in annot_ids:
            annots_entry = b" /Annots [%d 0 R]" % annot_ids[i]
        rot_entry = b" /Rotate %d" % rot if rot else b""
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]%b "
            b"/Resources << /Font << %b >>%b >>%b /Contents %d 0 R >>"
            % (page_w, page_h, rot_entry, font_res, xobj_res,
               annots_entry, content_num)
        )
        if page.get("cid"):
            stream = _cid_content_stream(
                page_runs_i, bool(page.get("tj")), cid_of
            )
        elif page.get("winansi"):
            stream = _coded_content_stream(
                page_runs_i, bool(page.get("tj")), _WINANSI_CODE_OF, b"F4"
            )
        elif page.get("macroman"):
            stream = _coded_content_stream(
                page_runs_i, bool(page.get("tj")), _MACROMAN_CODE_OF, b"F6"
            )
        elif page.get("type3"):
            stream = _coded_content_stream(
                page_runs_i, bool(page.get("tj")), t3_code_of, b"F5"
            )
        elif page.get("cid_noto"):
            stream = _cid_content_stream(
                page_runs_i, bool(page.get("tj")), cid_of, font=b"F3"
            )
        else:
            stream = _content_stream(
                page_runs_i,
                bool(page.get("tj")),
                bool(page.get("hex")) or bool(page.get("hex16")),
                bool(page.get("hex16")),
                invisible=bool(page.get("ocr_layer")),
            )
        if page.get("ocr_layer"):
            # the scanned page image paints first; the invisible text
            # layer sits on top of it, exactly as OCR software emits
            stream = b"/Im0 Do\n" + stream
        if ft:
            # letterhead drawn first, as real producers stamp it
            stream = b"/Fm1 Do\n" + stream
        if page.get("inline_image"):
            # prepended so the trap bytes precede every real text op
            stream = _INLINE_IMAGE + stream
        data, fdecl = _filter_stream(stream, page)
        content_obj = (
            b"<< /Length %d %b>>\nstream\n%b\nendstream"
            % (len(data), fdecl, data)
        )
        if incremental_update_page == i:
            # corpus v17.3 (classic INCREMENTAL UPDATE, spec 7.5.6: the
            # save-in-place workflow every signer/annotator uses): the
            # BASE body carries a superseded draft stream; the true
            # content object is APPENDED after the first %%EOF with its
            # own xref section chained via /Prev.  A reader that resolves
            # first-definition (or reads only the stale base table)
            # extracts "draft superseded" — the oracle catches it.
            true_update_obj = content_obj
            draft = (
                b"BT /F1 10 Tf 1 0 0 1 72 720 Tm (draft superseded) Tj ET"
            )
            content_obj = b"<< /Length %d >>\nstream\n%b\nendstream" % (
                len(draft), draft,
            )
        objects.append(content_obj)

    if corrupt_page_idx is not None:
        # corpus v17.2: ONE flipped byte in the middle of one page's
        # Flate-compressed content stream — the bit-rot/damaged-sector
        # form.  adler32 guarantees the decode fails loudly, so the
        # page's expected markdown is deterministically EMPTY and the
        # kernel must salvage every other page (the "undecodable
        # content stream" branch of the per-page damage capture).
        if xref_stream or object_streams or encrypt or hybrid_xref:
            raise ValueError(
                "corrupt_page_idx requires the plain classic-xref dialect"
            )
        pg = pages[corrupt_page_idx]
        if not pg.get("compress") or pg.get("filters"):
            # only plain Flate guarantees a LOUD decode failure (LZW/
            # A85/RL chains can decode flipped bytes silently) — fixture
            # bug, not a silent skip
            raise ValueError("corrupt_page_idx requires a compress page")
        ci = first_page_id + 2 * corrupt_page_idx  # content obj, 0-based
        obj = objects[ci]
        ds = obj.index(b"stream\n") + 7
        de = obj.rindex(b"\nendstream")
        mid = ds + (de - ds) // 2
        objects[ci] = obj[:mid] + bytes([obj[mid] ^ 0x5A]) + obj[mid + 1 :]

    enc_id = 0
    file_id = b""
    stream_fn = None
    cipher = {False: None, True: "rc4"}.get(encrypt, encrypt)
    if cipher:
        if cipher == "rc4" and (xref_stream or object_streams):
            # dialect constraint (documented): RC4 corpus files use the
            # classic xref table — matching the wild population, where
            # Standard-RC4 files are overwhelmingly the pre-1.5 era.
            # The AES forms ALLOW the modern combinations (AES-256 +
            # xref streams + ObjStm is today's default producer output).
            raise ValueError("rc4 encrypt requires the classic-xref dialect")
        file_id = hashlib.md5(b"\x00".join(objects)).digest()
        if cipher == "rc4":
            key, o_val, u_val = _std_security(file_id, p=-44)
            enc_dict = (
                b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 "
                b"/O <%b> /U <%b> >>"
                % (o_val.hex().encode(), u_val.hex().encode())
            )
        elif cipher == "aesv2":
            key, o_val, u_val = _std_security(file_id, p=-44)
            enc_dict = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF /P -44 "
                b"/O <%b> /U <%b> >>"
                % (o_val.hex().encode(), u_val.hex().encode())
            )
        elif cipher in ("aesv3", "aesv3r5"):
            r = 6 if cipher == "aesv3" else 5
            key, o_val, u_val, oe, ue, perms = _aesv3_security(
                file_id, p=-44, r=r
            )
            enc_dict = (
                b"<< /Filter /Standard /V 5 /R %d /Length 256 "
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF /P -44 "
                b"/O <%b> /U <%b> /OE <%b> /UE <%b> /Perms <%b> >>"
                % (
                    r,
                    o_val.hex().encode(),
                    u_val.hex().encode(),
                    oe.hex().encode(),
                    ue.hex().encode(),
                    perms.hex().encode(),
                )
            )
        else:
            raise ValueError(f"unknown cipher {cipher!r}")
        stream_fn = _stream_cipher(
            "rc4" if cipher == "rc4" else ("aesv2" if cipher == "aesv2" else "aesv3"),
            key,
            file_id,
        )
        objects = [
            _encrypt_obj_streams(
                obj, oid, stream_fn, strings=not object_streams
            )
            for oid, obj in enumerate(objects, 1)
        ]
        enc_id = len(objects) + 1
        objects.append(enc_dict)

    if object_streams:
        xref_stream = True  # ObjStm entries are only addressable from one
    header = b"%PDF-1.5\n" if xref_stream else b"%PDF-1.4\n"
    out = bytearray(header + b"%\xe2\xe3\xcf\xd3\n")

    # trailer fields shared by the xref-STREAM forms: the /Encrypt ref
    # and /ID live in the /Type /XRef stream's own dict (spec 7.5.8)
    xref_extra = b""
    if cipher:
        idh = file_id.hex().encode()
        xref_extra = b"/Encrypt %d 0 R /ID [<%b> <%b>] " % (enc_id, idh, idh)

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
        # (spec 7.5.7), so content/CMap/metadata objects stay top-level;
        # the /Encrypt dict also may not be packed (it must be readable
        # BEFORE any decryption, and the ObjStm body is itself encrypted)
        packed = [
            (i, obj)
            for i, obj in enumerate(objects, 1)
            if b"stream\n" not in obj and i != enc_id
        ]
        top = [
            (i, obj)
            for i, obj in enumerate(objects, 1)
            if b"stream\n" in obj or i == enc_id
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
        if stream_fn is not None:  # the ObjStm body is a stream like any
            stm_z = stream_fn(objstm_id, stm_z)
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
            b"%b%b/Filter /FlateDecode /Length %d >>\nstream\n%b\nendstream\nendobj\n"
            % (xref_id, xref_id + 1, xref_extra, parms, len(entries), entries)
        )
        out += b"startxref\n%d\n%%%%EOF\n" % xref_at
        return bytes(out)

    if hybrid_xref and (xref_stream or object_streams or cipher):
        # dialect constraint (documented): the hybrid-reference form
        # (spec 7.5.8.4) IS a classic-table file by construction, and
        # xref streams are never encrypted (they must be readable before
        # any key derivation) — the corpus keeps hybrids unencrypted
        raise ValueError("hybrid_xref requires the plain classic-xref dialect")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%b\nendobj\n" % (i, obj)
    xrefstm_extra = b""
    if hybrid_xref:
        # HYBRID-REFERENCE file (corpus v17, spec 7.5.8.4 — the
        # Acrobat-6-era compatibility form): a /Type /XRef stream with
        # the authoritative entries is written FIRST, then the classic
        # table whose trailer points at it via /XRefStm; startxref still
        # targets the classic table.  A 1.4 consumer reads the table, a
        # 1.5 consumer must prefer the stream's fields.
        xref_id = len(objects) + 1
        xrefstm_at = len(out)
        rows = [b"\x00" + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")]
        for off in offsets[1:] + [xrefstm_at]:
            rows.append(_t1(off))
        entries, parms = _entry_stream(rows)
        out += (
            b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
            b"%b/Filter /FlateDecode /Length %d >>\nstream\n%b\nendstream\nendobj\n"
            % (xref_id, xref_id + 1, parms, len(entries), entries)
        )
        xrefstm_extra = b" /XRefStm %d" % xrefstm_at
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
            b"%b%b/Filter /FlateDecode /Length %d >>\nstream\n%b\nendstream\nendobj\n"
            % (xref_id, xref_id + 1, xref_extra, parms, len(entries), entries)
        )
        out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    else:
        out += b"xref\n0 %d\n" % (len(objects) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        enc_entry = b""
        if encrypt:
            idh = file_id.hex().encode()
            enc_entry = b" /Encrypt %d 0 R /ID [<%b> <%b>]" % (enc_id, idh, idh)
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R%b%b >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, enc_entry, xrefstm_extra, xref_at)
        )
    if incremental_update_page is not None:
        # corpus v17.3: append the UPDATE GENERATION after the first
        # %%EOF — the true content object under the SAME object number,
        # a one-entry classic xref section, and a trailer chaining to
        # the base table via /Prev (spec 7.5.6).  The update's table is
        # what startxref now points at; the base body's draft stream is
        # superseded and must never extract.
        upd_num = first_page_id + 2 * incremental_update_page + 1
        upd_at = len(out)
        out += b"%d 0 obj\n%b\nendobj\n" % (upd_num, true_update_obj)
        upd_xref_at = len(out)
        out += b"xref\n%d 1\n%010d 00000 n \n" % (upd_num, upd_at)
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_at, upd_xref_at)
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
    (suppress, never mis-decode).  A ``form_text`` letterhead (corpus
    v12) renders as the page's LEADING block — and on a ``cid_noto``
    page it is the page's ONLY text (the stamp's simple font is readable
    even when the body is glyph-only)."""
    form = page_model.get("form_text")
    if page_model.get("cid_noto"):
        return "\n\n".join(
            p for p in (form, page_model.get("annot_text")) if p
        )
    cols = page_model.get("columns", 1)
    blocks = page_model["blocks"]
    if cols == 2:
        half = (len(blocks) + 1) // 2
        ordered = blocks[:half] + blocks[half:]
    else:
        ordered = blocks
    md: list[str] = [form] if form else []
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
    note = page_model.get("annot_text")
    if note:  # corpus v15: the margin note sits below everything — last
        md.append(note)
    return "\n\n".join(m for m in md if m)
