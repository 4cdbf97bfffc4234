"""Seeded document model: the single source of truth for fixtures.

A *document model* is a list of pages; each page a list of blocks:

* ``{"t": "h", "level": 1..4, "text": str}``
* ``{"t": "p", "spans": [(style, text), ...]}`` with style in ``"", "b",
  "i", "c"`` (bold/italic/code)
* ``{"t": "ul"|"ol", "items": [str, ...]}``
* ``{"t": "table", "rows": [[str, ...], ...]}`` (first row = header)
* ``{"t": "img", "alt": str, "src": str|None, "b64": str|None}`` —
  ``b64`` set => rendered as an inline ``data:`` image (payload travels in
  the page), else an external ``src`` reference

Three deterministic projections of the same model:

* :func:`render_html` — noisy Common-Crawl-style HTML bytes (boilerplate
  chrome, ads, comments, entity escaping, whitespace noise) fed to the
  production kernel
* :func:`expected_pages` — the ``ocr_pages`` shape (page markdown + images)
  the kernel must recover, i.e. the stand-in for MarkMuse's OCR response
  (``markmuse.py:563-565``, ``:347-352``)
* golden documents are then minted by the oracle tail
  (:func:`markmuse_spark.golden.oracle.assemble_document`)

Everything is driven by ``random.Random(seed)`` — same seed, same bytes.
"""

from __future__ import annotations

import base64
import html as _html
import random
from typing import Any, Optional

_WORDS_BY_LANG = {
    "en": (
        "the quick data engine batch stream column table join filter sort "
        "window merge partition shuffle page image chart value index key "
        "report analysis summary result system design model layer"
    ).split(),
    "zh": "数据 引擎 批处理 流式 列式 表格 连接 过滤 排序 窗口 合并 分区 页面 图像 报告 分析 系统 设计 模型".split(),
    "de": (
        "die daten maschine stapel strom spalte tabelle verbindung filter "
        "sortierung fenster zusammenführung partition seite bild bericht"
    ).split(),
    "fr": (
        "les données moteur lot flux colonne tableau jointure filtre tri "
        "fenêtre fusion partition page image rapport analyse système"
    ).split(),
    "es": (
        "los datos motor lote flujo columna tabla unión filtro orden "
        "ventana fusión partición página imagen informe análisis sistema"
    ).split(),
}
_LANGS = ("en", "zh", "de", "fr", "es")

_BOILER_NAV = '<nav class="main-nav"><ul class="menu"><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>'
_BOILER_HEADER = '<header><div class="logo">SiteLogo</div><div class="search-box"><form><input type="text"/></form></div></header>'
_BOILER_FOOTER = "<footer><p>© 2024 Example Corp. All rights reserved.</p><div>Privacy | Terms</div></footer>"
_BOILER_ADS = (
    '<div class="ad-banner">BUY NOW!!! limited offer</div>',
    '<div id="sidebar-widget" class="widget"><p>trending junk</p></div>',
    '<div class="social-share"><span>Share on X</span></div>',
    '<aside class="related"><ul><li>clickbait one</li><li>clickbait two</li></ul></aside>',
)


def _sentence(rng: random.Random, words: list[str], lo: int = 4, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    toks = rng.choices(words, k=n)
    s = " ".join(toks)
    if rng.random() < 0.3:
        s += rng.choice([".", "!", "?", " (note)", ", etc."])
    return s


def _make_image_payload(rng: random.Random) -> str:
    """Deterministic fake PNG-ish payload, 100..4000 bytes, base64."""
    n = rng.choice([40, 150, 400, 1200, 4000])  # 40 -> rejected (<100 bytes)
    body = bytes(rng.randrange(256) for _ in range(n))
    return base64.b64encode(b"\x89PNG\r\n\x1a\n" + body).decode()


def random_page_blocks(rng: random.Random, lang: str, rich: bool = True) -> list[dict]:
    """1-8 content sections: heading + paragraphs/lists/tables/images."""
    words = _WORDS_BY_LANG[lang]
    blocks: list[dict] = []
    n_sections = rng.randint(1, 8)
    img_budget = rng.randint(0, 4) if rich else 0
    tbl_budget = rng.randint(0, 3) if rich else 0
    for s in range(n_sections):
        level = 1 if s == 0 else rng.randint(2, 4)
        blocks.append({"t": "h", "level": level, "text": _sentence(rng, words, 2, 6)})
        for _ in range(rng.randint(1, 3)):
            kind = rng.random()
            if kind < 0.50:
                spans: list[tuple[str, str]] = []
                for _ in range(rng.randint(1, 3)):
                    if spans:
                        spans.append(("", " "))
                    style = rng.choice(["", "", "", "b", "i", "c"])
                    spans.append((style, _sentence(rng, words)))
                blocks.append({"t": "p", "spans": spans})
            elif kind < 0.66:
                items: list = [
                    _sentence(rng, words, 2, 7) for _ in range(rng.randint(2, 5))
                ]
                if rng.random() < 0.35:  # one nested sublist (depth 2)
                    sub = {
                        "t": rng.choice(["ul", "ol"]),
                        "text": _sentence(rng, words, 2, 6),
                        "items": [
                            _sentence(rng, words, 2, 5)
                            for _ in range(rng.randint(2, 3))
                        ],
                    }
                    items.insert(rng.randrange(len(items) + 1), sub)
                blocks.append({"t": rng.choice(["ul", "ol"]), "items": items})
            elif kind < 0.72:
                blocks.append({"t": "bq", "text": _sentence(rng, words, 4, 12)})
            elif kind < 0.78:
                lines = []
                for j in range(rng.randint(1, 4)):
                    indent = "    " if (j and rng.random() < 0.5) else ""
                    lines.append(
                        f"{indent}{rng.choice(words)} = "
                        f"{rng.choice(words)}({rng.randint(0, 99)})"
                    )
                blocks.append({"t": "pre", "code": lines})
            elif kind < 0.88 and tbl_budget > 0:
                tbl_budget -= 1
                ncol = rng.randint(2, 4)
                rows = [[rng.choice(words) for _ in range(ncol)]]
                for _ in range(rng.randint(1, 4)):
                    rows.append(
                        [str(rng.randint(0, 999)) if rng.random() < 0.5 else rng.choice(words) for _ in range(ncol)]
                    )
                blocks.append({"t": "table", "rows": rows})
            elif img_budget > 0:
                img_budget -= 1
                if rng.random() < 0.7:
                    img = {
                        "t": "img",
                        "alt": _sentence(rng, words, 1, 4),
                        "src": None,
                        "b64": _make_image_payload(rng),
                    }
                else:
                    img = {
                        "t": "img",
                        "alt": _sentence(rng, words, 1, 3),
                        "src": f"https://cdn.example/assets/photo-{rng.randrange(1000)}.jpg",
                        "b64": None,
                    }
                # ~40% of images sit inside <figure> with a <figcaption>
                # (corpus v4): the caption becomes its own markdown block
                # right after the image reference
                if rng.random() < 0.4:
                    img["caption"] = _sentence(rng, words, 3, 8)
                blocks.append(img)
            else:
                blocks.append({"t": "p", "spans": [("", _sentence(rng, words))]})
    return blocks


# --------------------------------------------------------------------------
# projection 1: noisy HTML bytes
# --------------------------------------------------------------------------

def random_pdf_pages(rng: random.Random, lang: str) -> list[dict]:
    """1-5 page models in the PDF dialect (headings h1-h3, paragraphs,
    lists; ~25% two-column pages per FIXTURES.md §1; ~60% of pages carry
    FlateDecode-compressed content streams and ~40% kerned ``TJ`` arrays —
    the real-corpus forms, see pdf_writer/pdf_extract round-2 dialect;
    ~25% emit string operands as BOM-prefixed UTF-16BE hex strings, the
    spec 7.9.2.2 Unicode text-string form — corpus v4; ~25% use a
    Type0/Identity-H SUBSET font whose 2-byte CIDs resolve only through
    the document's ToUnicode CMap — corpus v5, the realest real-corpus
    text form; ~8% are GLYPH-ONLY pages under a Type0 font with NO
    ToUnicode at all — corpus v8, expected markdown empty)."""
    words = _WORDS_BY_LANG[lang]
    pages: list[dict] = []
    for _ in range(rng.randint(1, 5)):
        columns = 2 if rng.random() < 0.25 else 1
        compress = rng.random() < 0.6
        use_tj = rng.random() < 0.4
        use_hex = rng.random() < 0.3
        use_hex16 = rng.random() < 0.25
        use_cid = rng.random() < 0.25
        # ~8% glyph-only pages (corpus v8): Type0 WITHOUT ToUnicode —
        # expected markdown for such a page is EMPTY (the documented
        # suppress-never-misdecode fallback); mutually exclusive with cid
        use_cid_noto = rng.random() < 0.08
        use_cid = use_cid and not use_cid_noto
        blocks: list[dict] = []
        n_sections = rng.randint(1, 4)
        for s in range(n_sections):
            level = 1 if s == 0 else rng.randint(2, 3)
            blocks.append({"t": "h", "level": level, "text": _sentence(rng, words, 2, 5)})
            for _ in range(rng.randint(1, 3)):
                if rng.random() < 0.75:
                    blocks.append(
                        {"t": "p", "spans": [("", _sentence(rng, words, 8, 30))]}
                    )
                else:
                    items = [_sentence(rng, words, 2, 4) for _ in range(rng.randint(2, 4))]
                    blocks.append({"t": rng.choice(["ul", "ol"]), "items": items})
        pages.append(
            {
                "columns": columns,
                "blocks": blocks,
                "compress": compress,
                "tj": use_tj,
                "hex": use_hex,
                "hex16": use_hex16,
                "cid": use_cid,
                "cid_noto": use_cid_noto,
            }
        )
    return pages


def _esc(s: str) -> str:
    return _html.escape(s, quote=False)


def _noise_ws(rng: random.Random) -> str:
    return rng.choice(["\n", "\n  ", "\n    ", " ", "\n\t", ""])


def _render_spans(spans: list[tuple[str, str]], rng: random.Random) -> str:
    out = []
    tag = {"b": rng.choice(["strong", "b"]), "i": rng.choice(["em", "i"]), "c": "code"}
    for style, txt in spans:
        body = _esc(txt)
        if rng.random() < 0.15:
            body = body.replace(" ", "\n   ", 1)  # mid-paragraph line noise
        if style:
            t = tag[style]
            out.append(f"<{t}>{body}</{t}>")
        else:
            out.append(body)
    return "".join(out)


def _render_block(b: dict, rng: random.Random) -> str:
    t = b["t"]
    ws = _noise_ws(rng)
    if t == "h":
        return f"<h{b['level']}>{_esc(b['text'])}</h{b['level']}>{ws}"
    if t == "p":
        attr = ' class="body-text"' if rng.random() < 0.3 else ""
        return f"<p{attr}>{_render_spans(b['spans'], rng)}</p>{ws}"
    if t in ("ul", "ol"):
        rendered = []
        for it in b["items"]:
            if isinstance(it, dict):  # item with a nested sublist
                subs = "".join(f"<li>{_esc(s)}</li>" for s in it["items"])
                rendered.append(
                    f"{_noise_ws(rng)}<li>{_esc(it['text'])}"
                    f"<{it['t']}>{subs}</{it['t']}></li>"
                )
            else:
                rendered.append(f"{_noise_ws(rng)}<li>{_esc(it)}</li>")
        return f"<{t}>{''.join(rendered)}{_noise_ws(rng)}</{t}>{ws}"
    if t == "table":
        rows_html = []
        for i, row in enumerate(b["rows"]):
            cell = "th" if i == 0 else "td"
            cells = "".join(f"<{cell}>{_esc(c)}</{cell}>" for c in row)
            rows_html.append(f"<tr>{cells}</tr>{_noise_ws(rng)}")
        body = "".join(rows_html)
        if rng.random() < 0.4:
            return f"<table><thead>{rows_html[0]}</thead><tbody>{''.join(rows_html[1:])}</tbody></table>{ws}"
        return f"<table>{body}</table>{ws}"
    if t == "bq":
        return f"<blockquote>{_noise_ws(rng)}<p>{_esc(b['text'])}</p></blockquote>{ws}"
    if t == "pre":
        # verbatim content: no whitespace noise inside the <pre> subtree
        code = _esc("\n".join(b["code"]))
        return f"<pre><code>{code}</code></pre>{ws}"
    if t == "img":
        alt = _html.escape(b["alt"], quote=True)
        if b["b64"] is not None:
            src = "data:image/png;base64," + b["b64"]
        else:
            src = b["src"]
        slash = "/" if rng.random() < 0.5 else ""
        img = f'<img src="{src}" alt="{alt}"{slash}>'
        if b.get("caption"):
            return (
                f"<figure>{_noise_ws(rng)}{img}{_noise_ws(rng)}"
                f"<figcaption>{_esc(b['caption'])}</figcaption>"
                f"{_noise_ws(rng)}</figure>{ws}"
            )
        return f"{img}{ws}"
    raise AssertionError(t)


def render_html(blocks: list[dict], rng: random.Random, truncate_after: Optional[int] = None) -> bytes:
    """Render model blocks to noisy full-page HTML (utf-8 bytes).

    ``truncate_after``: emit only the first N content blocks and stop without
    any closing chrome — the deterministic "truncated payload" fixture.
    """
    parts = [
        "<!DOCTYPE html><html><head><title>Generated</title>",
        "<style>body{font:14px sans-serif}.ad-banner{color:red}</style>",
        '<script type="text/javascript">var tracking = "junk" < 5;</script>',
        "</head><body>",
        _BOILER_HEADER,
        _BOILER_NAV,
    ]
    if rng.random() < 0.7:
        parts.append(rng.choice(_BOILER_ADS))
    parts.append('<div class="content-wrap"><article>')
    depth = 0
    n = len(blocks) if truncate_after is None else min(truncate_after, len(blocks))
    for i in range(n):
        if rng.random() < 0.15:
            parts.append('<div class="content-block">')
            depth += 1
        if rng.random() < 0.1:
            parts.append(f"<!-- comment noise {rng.randrange(100)} -->")
        if rng.random() < 0.08:
            parts.append(rng.choice(_BOILER_ADS))
        parts.append(_render_block(blocks[i], rng))
        if depth and rng.random() < 0.5:
            parts.append("</div>")
            depth -= 1
    if truncate_after is not None:
        return "".join(parts).encode("utf-8")
    parts.extend("</div>" for _ in range(depth))
    parts.append("</article></div>")
    if rng.random() < 0.5:
        parts.append(rng.choice(_BOILER_ADS))
    parts.append(_BOILER_FOOTER)
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


# --------------------------------------------------------------------------
# projection 2: expected ocr_pages shape (what the kernel must recover)
# --------------------------------------------------------------------------

def expected_page(blocks: list[dict], page_idx: int = 0, upto: Optional[int] = None) -> dict:
    md: list[str] = []
    images: list[dict] = []
    k = 0
    n = len(blocks) if upto is None else min(upto, len(blocks))
    for b in blocks[:n]:
        t = b["t"]
        if t == "h":
            md.append("#" * b["level"] + " " + b["text"])
        elif t == "p":
            marks = {"b": "**", "i": "*", "c": "`"}
            s = "".join(
                f"{marks[st]}{txt}{marks[st]}" if st else txt for st, txt in b["spans"]
            )
            md.append(s.strip())
        elif t in ("ul", "ol"):
            lines: list[str] = []
            n = 1
            for it in b["items"]:
                marker = "- " if t == "ul" else f"{n}. "
                n += 1
                if isinstance(it, dict):
                    lines.append(marker + it["text"])
                    sub_t = it["t"]
                    for j, s in enumerate(it["items"]):
                        sm = "- " if sub_t == "ul" else f"{j + 1}. "
                        lines.append("  " + sm + s)
                else:
                    lines.append(marker + it)
            md.append("\n".join(lines))
        elif t == "bq":
            md.append("> " + b["text"])
        elif t == "pre":
            md.append("```\n" + "\n".join(b["code"]) + "\n```")
        elif t == "table":
            rows = b["rows"]
            lines = ["| " + " | ".join(rows[0]) + " |"]
            lines.append("| " + " | ".join("---" for _ in rows[0]) + " |")
            lines.extend("| " + " | ".join(r) + " |" for r in rows[1:])
            md.append("\n".join(lines))
        elif t == "img":
            if b["b64"] is not None:
                k += 1
                img_id = f"img-p{page_idx + 1}-{k}.png"
                images.append(
                    {"id": img_id, "image_base64": "data:image/png;base64," + b["b64"]}
                )
                md.append(f"![{b['alt']}]({img_id})")
            else:
                md.append(f"![{b['alt']}]({b['src']})")
            if b.get("caption"):  # <figcaption> -> its own block
                md.append(b["caption"])
    return {
        "page_idx": page_idx,
        "markdown": "\n\n".join(m for m in md if m),
        "images": images,
    }
