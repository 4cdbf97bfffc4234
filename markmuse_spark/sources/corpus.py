"""Deterministic Common-Crawl-style ``pages`` corpus + golden fixtures.

Implements FIXTURES.md §1 exactly: per-row content is a pure function of
``(seed, row_id)`` so the corpus can be generated **distributed** (Spark
``range -> mapInPandas``) at any scale with identical bytes at any
parallelism — the property that lets the same generator back unit tests
(hundreds of rows) and the 100k-row bench table.

Row mix (by row id ``i``):

* ~2%  adversarial  (``i % 50 == 7``): empty payload (expected error) or
  truncated HTML (golden = prefix blocks)
* ~20% PDF          (``i % 5 == 4``, url gains a ``.pdf`` segment)
* rest HTML         (nested divs, boilerplate chrome, headings, lists,
  tables, inline ``data:`` images incl. <100-byte rejects)
* skew knob: ``i % 1000 == 500`` -> payload ~100x median (FIXTURES §1)

Golden documents are minted by the oracle tail
(:func:`markmuse_spark.golden.oracle.assemble_document`) over the *expected*
page shape — never by running the production kernel.
"""

from __future__ import annotations

import datetime as _dt
import random
import re
from typing import Any, Optional

# v17 garbled-xref rewrite: the single startxref our writer emits
_STARTXREF_RE = re.compile(rb"startxref\s+\d+")

# v17.1 junk-before-header forms (all < 1024 bytes, none containing
# "%PDF-" or an "obj" keyword): HTTP response leak, proxy comment
# banner, UTF-8 BOM + nulls, chunked-encoding size residue
_JUNK_PREFIXES = (
    b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n"
    b"Content-Length: 999999\r\n\r\n",
    b"<!-- cache: hit upstream=edge-7 -->\r\n" * 8,
    b"\xef\xbb\xbf" + b"\x00" * 37,
    b"1ff8\r\n",
)

from markmuse_spark.golden import oracle
from markmuse_spark.sources import docmodel, pdf_writer

_CATEGORIES = ("articles", "docs", "news", "blog", "papers")
# corpus v12 letterhead texts (Form XObject stamps; one per document,
# drawn on every page — the shared-letterhead shape real producers emit)
_FORM_TEXTS = (
    "Example Corp — Confidential",
    "ACME Industries official letterhead",
    "Draft — do not distribute",
    "Filed with the Example County Clerk",
    "Ejemplo S.A. — uso interno",
)
# corpus v13 heading decorations: cp1252-exercising typographic text so
# the winansi /Differences remap (and octal escapes) actually bite
_WINANSI_SUFFIXES = (
    "— “édition spéciale”…",
    "“Œuvre complète” — 20 €",
    "Groß & Söhne — Müßiggang…",
    "«résumé» ¡España! ±½",
)


def _mac_encodable(s: str) -> bool:
    try:
        s.encode("mac_roman")
        return True
    except UnicodeEncodeError:
        return False


# mac_roman lacks the vulgar fractions, so macroman pages draw from the
# encodable subset (the writer raises on an unencodable char by contract)
_MACROMAN_SUFFIXES = tuple(s for s in _WINANSI_SUFFIXES if _mac_encodable(s))
# corpus v15 margin notes (FreeText annotation /Contents strings)
_ANNOT_NOTES = (
    "Reviewed by the standards board — approved",
    "Margen: véase el apéndice B",
    "Nota del editor: cifras preliminares",
    "DRAFT — numbers subject to audit",
)
_LANGS = ("en", "zh", "de", "fr", "es")
_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)


def row_url(i: int) -> str:
    cat = _CATEGORIES[i % len(_CATEGORIES)]
    suffix = ".pdf" if (i % 5 == 4 and i % 50 != 7) else ""
    return f"https://site{i % 97}.example/{cat}/doc-{i:06d}{suffix}"


def row_ts(i: int) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(seconds=137 * i)


def _make_doc(i: int, seed: int) -> tuple[str, bytes, Optional[list[dict]], Optional[str]]:
    """Pure per-row spec.

    Returns ``(url, payload, expected_pages, expected_error)``;
    ``expected_pages`` is the ocr_pages shape the kernel must recover
    (None for expected-error rows).
    """
    url = row_url(i)
    lang = _LANGS[i % len(_LANGS)]
    rng = random.Random(f"{seed}:{i}")

    if i % 50 == 7:
        if i % 100 == 7:
            return url, b"", None, "empty payload"
        blocks = docmodel.random_page_blocks(rng, lang)
        cut = max(1, len(blocks) // 2)
        payload = docmodel.render_html(blocks, rng, truncate_after=cut)
        return url, payload, [docmodel.expected_page(blocks, 0, upto=cut)], None

    if i % 5 == 4:
        pages_model = docmodel.random_pdf_pages(rng, lang)
        # ~30% of PDFs carry an XMP metadata stream (corpus v5) — a
        # non-content stream the extractor must not mint a page from;
        # ~35% are PDF 1.5 cross-reference-STREAM files (corpus v6, the
        # modern-default form): trailer fields live in a /Type /XRef
        # stream's dict and the extractor resolves /Root through it;
        # ~20% additionally pack the ENTIRE page tree into a /ObjStm
        # object stream (corpus v7 — no catalog/pages/page object exists
        # top-level; the extractor must unpack it to see the graph);
        # ~8% of pages are GLYPH-ONLY (corpus v8): a Type0 font with no
        # ToUnicode CMap — expected markdown for the page is EMPTY (the
        # suppress-never-misdecode fallback, exercised end-to-end here);
        # ~45% of xref-STREAM files PNG-predict their entry table
        # (corpus v9: /DecodeParms /Predictor 12, Up-filtered rows — the
        # form most real writers emit; the predictor draw is APPENDED
        # after the existing knob draws so every prior rng consumer sees
        # an unchanged stream: page content and the other knobs are
        # byte-identical to v8, only predictor'd files' bytes move);
        # corpus v10 (draws again APPENDED, content untouched): per page,
        # ~10% LZWDecode / ~10% [ASCII85+Flate] / ~5% RunLength / ~3%
        # ASCIIHex content-stream filter chains (the pre-Flate-era forms
        # still common in wild PDFs), and ~7% of non-CID pages carry an
        # INLINE IMAGE (BI..ID..EI) whose sample bytes parse as a text
        # operator — opaque data the tokenizer must skip, never mojibake;
        # ~10% of classic-xref documents are RC4-ENCRYPTED (Standard
        # handler V2/R3, empty user password — the dominant wild
        # encrypted form; the kernel decrypts, verifies /U, and fails
        # LOUDLY on a real password);
        # corpus v11 (draws again APPENDED, content untouched): the
        # encrypted population gains the AES forms — ~35% of classic-
        # xref encrypted files use V4/AESV2 (the Acrobat-7-era form),
        # and ~12% of MODERN files (xref-stream / ObjStm dialects, which
        # RC4 never touches) are AES-256 V5 Standard-handler encrypted.
        # V5 splits ~2% revision 6 (PDF 2.0 Algorithm-2.B hardened KDF)
        # / ~98% revision 5 (single-SHA-256): R6's KDF is DELIBERATELY
        # ~0.2s/file (password hardening — every conforming reader pays
        # it), so the corpus keeps it present-but-rare to keep the bench
        # measuring extraction rather than key stretching — disclosed in
        # BASELINE.md;
        # corpus v12 (draws again APPENDED, content untouched): ~15% of
        # PDFs carry a shared FORM XOBJECT letterhead (spec 8.10) — one
        # /Subtype /Form stream invoked from every page's content via
        # `/Fm1 Do`, its font declared ONLY in the form's own
        # /Resources.  Text inside Form XObjects (letterheads, stamps,
        # PDF/A headers) is the dominant remaining wild-PDF text form:
        # the extractor must splice the form's operators at the
        # invocation point and resolve form-scoped font resources —
        # including on glyph-only pages, where the stamp is the page's
        # ONLY readable text;
        # corpus v13 (draws again APPENDED, prior knobs unchanged):
        # ~12% of eligible simple-font pages (not cid/cid_noto/hex/
        # hex16, non-zh docs) declare /BaseEncoding /WinAnsiEncoding
        # with a /Differences block remapping typographic chars to low
        # codes 16..23 — string operands become BYTE CODES (raw or
        # \2xx octal escapes), the pdflatex/office-era wild form; the
        # page's first heading gains cp1252-exercising punctuation so
        # the Differences remap actually bites;
        # corpus v14 (draws again APPENDED): ~6% of eligible documents
        # render ENTIRELY through a TYPE3 font (spec 9.6.5 — the
        # dvips/bitmap era, incl. CJK docs via /uniXXXX glyph names):
        # every used char gets a /CharProcs glyph-procedure stream and
        # a /Differences code; no base encoding, no ToUnicode — the
        # glyph-name path is the only decode route, and the glyph
        # procedures are opaque drawing streams that must never become
        # pages or text;
        # corpus v15 (draws again APPENDED): ~8% of UNENCRYPTED docs
        # carry a visible FreeText ANNOTATION (spec 12.5.6.6) on their
        # first single-column page — a margin-note box whose text lives
        # in the annotation dict's /Contents string, not in any content
        # stream; a rendering pipeline (the reference OCRs rendered
        # pages) reads the visible box as page text, so the note is the
        # page's final block; corpus v16.1 extends annotations to
        # ENCRYPTED docs — the /Contents string rides as ciphertext
        # under the annotation object's key (spec 7.6.2) and the
        # extractor decrypts it at read time;
        # corpus v15.1 (draws again APPENDED): ~6% of plain-font pages
        # are SCANNED-PAGE forms — a full-page DCTDecode image XObject
        # paints first (opaque pixels, never decoded or tokenized),
        # then the text renders INVISIBLY (3 Tr, spec 9.3.6) — exactly
        # what OCR software emits; the invisible layer IS the document
        # text and must extract identically to a visible page;
        # corpus v16 (draws again APPENDED): ~6% of eligible pages are
        # ROTATED (spec 7.7.3.3 /Rotate, landscape MediaBox for 90/270
        # — the rotated-scan form): content coordinates live in the
        # UNROTATED page space and the viewer turns the page upright,
        # so reading order must derive from the rotated (visual)
        # coordinates; 90 and 270 dominate (sideways scans), 180 rare
        # (upside-down feeds)
        metadata = rng.random() < 0.3
        xref_stream = rng.random() < 0.35
        object_streams = rng.random() < 0.2
        xref_predictor = rng.random() < 0.45
        for pm in pages_model:
            fdraw = rng.random()
            if fdraw < 0.10:
                pm["filters"] = "lzw"
            elif fdraw < 0.20:
                pm["filters"] = "a85_flate"
            elif fdraw < 0.25:
                pm["filters"] = "rl"
            elif fdraw < 0.28:
                pm["filters"] = "ahx"
            inline_draw = rng.random()  # drawn unconditionally: keeps the
            # stream aligned whatever the page's font knobs drew
            pm["inline_image"] = (
                inline_draw < 0.07
                and not pm.get("cid")
                and not pm.get("cid_noto")
            )
        encrypt = rng.random() < 0.10 and not (xref_stream or object_streams)
        cdraw = rng.random()  # v11: appended — prior knobs see the same stream
        cipher: object = False
        if encrypt:
            cipher = "rc4" if cdraw < 0.65 else "aesv2"
        elif (xref_stream or object_streams) and cdraw < 0.12:
            cipher = "aesv3" if rng.random() < 0.02 else "aesv3r5"
        form_draw = rng.random()  # v12: appended — prior knobs unchanged
        if form_draw < 0.15:
            ltext = _FORM_TEXTS[int(rng.random() * len(_FORM_TEXTS))]
            for pm in pages_model:
                pm["form_text"] = ltext
        if lang != "zh":  # v13: appended — cp1252 cannot carry CJK text
            for pm in pages_model:
                wdraw = rng.random()
                if wdraw < 0.12 and not (
                    pm.get("cid")
                    or pm.get("cid_noto")
                    or pm.get("hex")
                    or pm.get("hex16")
                ):
                    # v14.1 (appended sub-draw): ~25% of declared-
                    # encoding pages use the BARE-NAME form
                    # /Encoding /MacRomanEncoding instead of the
                    # WinAnsi+Differences dict — the two common
                    # spellings both corpus-exercised
                    if rng.random() < 0.25:
                        pm["macroman"] = True
                        pool = _MACROMAN_SUFFIXES
                    else:
                        pm["winansi"] = True
                        pool = _WINANSI_SUFFIXES
                    deco = pool[int(rng.random() * len(pool))]
                    for b in pm["blocks"]:
                        if b["t"] == "h":
                            b["text"] = b["text"] + " " + deco
                            break
        t3draw = rng.random()  # v14: appended — prior knobs unchanged
        if t3draw < 0.06:
            chars = set("- .0123456789")  # list markers the layout adds
            for pm in pages_model:
                for b in pm["blocks"]:
                    if b["t"] in ("h", "p"):
                        chars.update(
                            " ".join(t for _, t in b["spans"])
                            if "spans" in b
                            else b["text"]
                        )
                    else:
                        for it in b["items"]:
                            chars.update(it)
            if len(chars) <= 200 and all(ord(c) <= 0xFFFF for c in chars):
                # a dvips-era document is UNIFORMLY Type3: the font-form
                # knobs its pages drew are overridden (text and layout
                # stay as drawn — incl. glyph-only pages, whose text
                # becomes readable again through the glyph-name path)
                for pm in pages_model:
                    pm["type3"] = True
                    for k in (
                        "cid", "cid_noto", "hex", "hex16",
                        "winansi", "macroman",
                    ):
                        pm.pop(k, None)
        adraw = rng.random()  # v15: appended — prior knobs unchanged
        if adraw < 0.08:  # v16.1: encrypted docs included — their
            # /Contents strings ride as per-object-key ciphertext
            note = _ANNOT_NOTES[int(rng.random() * len(_ANNOT_NOTES))]
            for pm in pages_model:
                if pm.get("columns", 1) == 1:
                    pm["annot_text"] = note
                    break
        for pm in pages_model:  # v15.1: appended per-page draws
            odraw = rng.random()
            if odraw < 0.06 and not any(
                pm.get(k)
                for k in ("cid", "cid_noto", "winansi", "macroman", "type3")
            ):
                pm["ocr_layer"] = True
        for pm in pages_model:  # v16: appended per-page draws
            rdraw = rng.random()
            if rdraw < 0.06 and not (
                pm.get("form_text")
                or pm.get("annot_text")
                or pm.get("ocr_layer")
            ):
                pm["rotate"] = (
                    90 if rdraw < 0.027 else (270 if rdraw < 0.054 else 180)
                )
        # v17 (appended doc-level draw): the WILD-INPUT population —
        # ~10% of eligible classic unencrypted files are HYBRID-REFERENCE
        # (spec 7.5.8.4: classic table + /XRefStm pointing at an xref
        # STREAM whose fields take precedence; extraction unchanged);
        # ~3% have a GARBLED xref (startxref out of range — the damaged-
        # download form; root resolution must fall back to the body scan,
        # extraction unchanged); ~2.5% of eligible multi-page files are
        # TRUNCATED mid-way through the LAST page's content stream (the
        # Common-Crawl norm): the kernel salvages every intact page and
        # reports a deterministic PartialExtraction error note alongside
        # the recovered markdown — never all-or-nothing
        v17draw = rng.random()
        hybrid = truncate_last = garble = False
        corrupt_idx = incr_page = None
        if v17draw < 0.10:
            hybrid = not (xref_stream or object_streams or cipher)
        elif v17draw < 0.13:
            garble = not cipher
        elif v17draw < 0.155:
            truncate_last = (
                len(pages_model) >= 2
                and not (xref_stream or object_streams or cipher)
                and not pages_model[-1].get("annot_text")
            )
        elif v17draw < 0.225:
            # v17.2: ONE flipped byte in a MIDDLE page's Flate stream
            # (bit rot / damaged sector): that page's expected markdown
            # is EMPTY, every other page must extract intact, and the
            # document carries the partial note — the "undecodable
            # content stream" branch of the per-page damage capture
            # (truncation above exercises the "missing stream" branch)
            if len(pages_model) >= 2 and not (
                xref_stream or object_streams or cipher
            ):
                mid = len(pages_model) // 2
                # first eligible page, middle-out (damage can land on
                # any page; middle-preferred so both salvage directions
                # — pages before AND after the damage — stay exercised)
                for k in sorted(
                    range(len(pages_model)), key=lambda j: abs(j - mid)
                ):
                    pm = pages_model[k]
                    if pm.get("filters") or (
                        pm.get("annot_text")
                        or pm.get("form_text")
                        or pm.get("ocr_layer")
                        or pm.get("inline_image")
                    ):
                        continue
                    pm["compress"] = True  # plain Flate: loud failure
                    corrupt_idx = k
                    break
        elif v17draw < 0.32:
            # v17.3: classic INCREMENTAL UPDATE (spec 7.5.6 — the
            # save-in-place form every signer/annotator emits): the base
            # body carries a superseded draft stream for page 0, the
            # appended generation carries the true content chained via
            # /Prev.  Expected markdown is UNCHANGED — a reader that
            # resolves first-definition or reads only the stale base
            # table would extract "draft superseded" and fail the oracle.
            if not (xref_stream or object_streams or cipher):
                incr_page = 0
        payload = pdf_writer.write_pdf(
            pages_model,
            metadata=metadata,
            xref_stream=xref_stream,
            object_streams=object_streams,
            xref_predictor=xref_predictor,
            encrypt=cipher,
            hybrid_xref=hybrid,
            corrupt_page_idx=corrupt_idx,
            incremental_update_page=incr_page,
        )
        err = None
        if corrupt_idx is not None:
            err = f"PartialExtraction: 1/{len(pages_model)} pages damaged"
        if garble:
            payload = _STARTXREF_RE.sub(
                b"startxref\n9999999999", payload, count=1
            )
        elif truncate_last:
            # cut inside the final content stream's data: the stream is
            # unterminated, the xref/trailer tail is gone — every page
            # but the last survives; the last page's expected markdown
            # is EMPTY and the document carries the partial note
            payload = payload[: payload.rfind(b"endstream") - 5]
            err = (
                f"PartialExtraction: 1/{len(pages_model)} pages damaged"
            )
        # v17.1: ~3% of PDFs arrive with JUNK BEFORE THE HEADER — a proxy
        # banner, an HTTP response leak, chunked-encoding residue (spec
        # Annex C tolerance: up to 1024 bytes, offsets header-relative).
        # Applied LAST so it composes with garble/truncate; expected
        # markdown is UNCHANGED — the kernel must sniff the header, slice,
        # and extract identically instead of minting the raw PDF syntax
        # through the HTML path.
        jdraw = rng.random()
        if jdraw < 0.03:
            payload = _JUNK_PREFIXES[int(jdraw * 1000) % len(_JUNK_PREFIXES)] + payload
        expected = [
            {
                "page_idx": k,
                "markdown": (
                    ""
                    if (truncate_last and k == len(pages_model) - 1)
                    or k == corrupt_idx
                    else pdf_writer.expected_pdf_page_markdown(pm)
                ),
                "images": [],
            }
            for k, pm in enumerate(pages_model)
        ]
        return url, payload, expected, err

    blocks = docmodel.random_page_blocks(rng, lang)
    if i % 1000 == 500:  # skew straggler: ~100x median payload
        blocks = blocks * max(1, 800 // max(1, len(blocks)))
    payload = docmodel.render_html(blocks, rng)
    return url, payload, [docmodel.expected_page(blocks, 0)], None


def make_page_row(i: int, seed: int = 42) -> dict[str, Any]:
    """One row of the ``pages`` table (FIXTURES §1 schema)."""
    url, payload, expected, _err = _make_doc(i, seed)
    lang = _LANGS[i % len(_LANGS)]
    # pre-extracted text column "may be empty; the pipeline recomputes its
    # own" (FIXTURES §1) — populate every other row with a rough projection
    if expected and i % 2 == 0:
        pre_text = oracle.plain_text(expected[0]["markdown"])[:400]
    else:
        pre_text = ""
    return {
        "url": url,
        "warc_ts": row_ts(i),
        "html": payload,
        "text": pre_text,
        "lang": lang,
    }


def make_golden_row(i: int, seed: int = 42) -> dict[str, Any]:
    """One row of the ``golden_markdown`` table (FIXTURES §3 schema)."""
    url, _payload, expected, err = _make_doc(i, seed)
    if expected is None:  # hard-error row (no pages recoverable)
        return {
            "url": url,
            "markdown": None,
            "extracted_text": None,
            "n_images": 0,
            "error_expected": err,
        }
    # partial rows (corpus v17 truncation) carry BOTH: the salvaged
    # pages' assembled markdown AND the deterministic error note
    doc = oracle.assemble_document(url, expected)
    return {
        "url": url,
        "markdown": doc["markdown"],
        "extracted_text": doc["extracted_text"],
        "n_images": len(doc["image_manifest"]),
        "error_expected": err,
    }


# ----------------------------------------------------------------------
# Spark-distributed generation (scale path; also used by bench.py)
# ----------------------------------------------------------------------

_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
_GOLDEN_DDL = (
    "url string, markdown string, extracted_text string, n_images int, "
    "error_expected string"
)


def pages_dataframe(spark, n_rows: int, seed: int = 42, partitions: int = 32):
    """Distributed pages-table generation: ``spark.range`` -> ``mapInPandas``.

    Content depends only on (seed, id); partitioning/parallelism cannot
    change the data — safe at any cluster size.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [make_page_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=_PAGES_DDL)
    )


def golden_dataframe(spark, n_rows: int, seed: int = 42, partitions: int = 32):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [make_golden_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=_GOLDEN_DDL)
    )
