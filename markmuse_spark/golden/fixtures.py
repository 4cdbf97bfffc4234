"""Deterministic adversarial fixtures for the assembly tail (FIXTURES.md §2).

Generates ``ocr_pages``-shaped documents exercising every edge case the
reference encodes:

* base64 variants: plain, data-URI-prefixed, whitespace-littered,
  missing-padding (repair, ``markmuse.py:419-424``), <100-byte rejects
  (``:429-430``), malformed data-URI headers, empty/missing payloads
* image ids: missing (default ``img-p{p}-{k}.png``, ``:390``), chars needing
  sanitization (``:393``), extension-less (dual-key, ``:366-368``), ids with
  7-list-only extensions (``.bmp``/``.tiff``), empty-string ids
* markdown refs: bare ids, URL-prefixed (last-segment extraction,
  ``:573-577``), unmatched (verbatim passthrough, ``:661-662``), refs to
  rejected images, refs needing the 5-ext probe fallback (``:640-649``),
  empty alt text, refs whose target ends with ``/``
* pages: out-of-order page_idx, pages with null markdown (skipped entirely,
  ``:563-564``), image-less pages

All randomness is seeded; calling twice yields identical fixtures.
"""

from __future__ import annotations

import base64
import random
from typing import Any

# 120 deterministic payload bytes -> passes the >=100-byte gate
_OK_BYTES = bytes(range(120))
_OK_B64 = base64.b64encode(_OK_BYTES).decode()
# 40 bytes -> rejected by the <100-byte gate
_SMALL_B64 = base64.b64encode(b"tiny" * 10).decode()


def _whitespaced(b64: str) -> str:
    return "\n".join(b64[i : i + 17] for i in range(0, len(b64), 17)) + " \t"


def _unpadded(b64: str) -> str:
    return b64.rstrip("=")


def edge_case_documents() -> list[dict[str, Any]]:
    """Hand-built documents pinning each reference edge case."""
    docs: list[dict[str, Any]] = []

    # 1. plain doc: two ordered pages, one plain image, bare-id ref
    docs.append(
        {
            "url": "https://site0.example/articles/alpha",
            "pages": [
                {
                    "page_idx": 0,
                    "markdown": "# Alpha\n\nIntro text.\n\n![fig one](img-0.png)",
                    "images": [{"id": "img-0.png", "image_base64": _OK_B64}],
                },
                {"page_idx": 1, "markdown": "Second page, no images.", "images": []},
            ],
        }
    )

    # 2. data-URI + whitespace + padding repair + reject + unmatched ref
    docs.append(
        {
            "url": "https://site1.example/reports/q3.pdf",
            "pages": [
                {
                    "page_idx": 0,
                    "markdown": (
                        "## Q3 Report\n\n"
                        "![jpeg](img-a.jpeg)\n\n"
                        "![ws](img-b.png)\n\n"
                        "![pad](img-c.png)\n\n"
                        "![reject](img-small.png)\n\n"
                        "![ghost](never-extracted.png)"
                    ),
                    "images": [
                        {
                            "id": "img-a.jpeg",
                            "image_base64": "data:image/jpeg;base64," + _OK_B64,
                        },
                        {"id": "img-b.png", "image_base64": _whitespaced(_OK_B64)},
                        {"id": "img-c.png", "image_base64": _unpadded(_OK_B64)},
                        {"id": "img-small.png", "image_base64": _SMALL_B64},
                    ],
                },
            ],
        }
    )

    # 3. sanitize rule + extension-less dual-key + URL-prefixed refs +
    #    probe-fallback ref
    docs.append(
        {
            "url": "https://site2.example/docs/guide.pdf",
            "pages": [
                {
                    "page_idx": 0,
                    "markdown": (
                        '![weird](we?ird:im"g.png)\n\n'
                        "![noext](figure-7)\n\n"
                        "![viaurl](https://cdn.example/x/y/figure-7)\n\n"
                        "![probe](chart-1)"
                    ),
                    "images": [
                        {"id": 'we?ird:im"g.png', "image_base64": _OK_B64},
                        {"id": "figure-7", "image_base64": _OK_B64},
                        # stored as chart-1.png; the (chart-1) ref only
                        # resolves through the probe fallback
                        {"id": "chart-1.png", "image_base64": _OK_B64},
                    ],
                },
            ],
        }
    )

    # 4. missing ids (default naming), out-of-order pages, null-markdown page
    docs.append(
        {
            "url": "https://site3.example/misc/mixed.pdf",
            "pages": [
                {
                    "page_idx": 2,
                    "markdown": "last page\n\n![d](img-p3-1.png)",
                    "images": [{"id": None, "image_base64": _OK_B64}],
                },
                {"page_idx": 0, "markdown": "first page", "images": []},
                {
                    "page_idx": 1,
                    "markdown": None,
                    "images": [{"id": "orphan.png", "image_base64": _OK_B64}],
                },
            ],
        }
    )

    # 5. 7-ext-only extensions (.bmp kept, no dual key; .tiff ref probes fail)
    docs.append(
        {
            "url": "https://site4.example/img/exts",
            "pages": [
                {
                    "page_idx": 0,
                    "markdown": (
                        "![bmp](pic.bmp)\n\n![tiffnoext](pic2)\n\n![](pic.bmp)"
                    ),
                    "images": [
                        {"id": "pic.bmp", "image_base64": _OK_B64},
                        {"id": "pic2.tiff", "image_base64": _OK_B64},
                    ],
                },
            ],
        }
    )

    # 6. degenerate: empty-string id, empty/None base64, malformed data-URI,
    #    ref via trailing slash, empty markdown page
    docs.append(
        {
            "url": "https://site5.example/degenerate/case.PDF",
            "pages": [
                {
                    "page_idx": 0,
                    "markdown": (
                        "![empty-id](x/)\n\n![none](no-b64.png)\n\n"
                        "![bad-uri](bad.png)\n\n"
                    ),
                    "images": [
                        {"id": "", "image_base64": _OK_B64},
                        {"id": "no-b64.png", "image_base64": None},
                        {"id": "bad.png", "image_base64": ";base64," + _OK_B64},
                    ],
                },
                {"page_idx": 1, "markdown": "", "images": []},
            ],
        }
    )

    # 7. colliding ids across pages (later page wins, pinned determinism)
    docs.append(
        {
            "url": "https://site6.example/collide/doc.pdf",
            "pages": [
                {
                    "page_idx": 0,
                    "markdown": "![one](dup)",
                    "images": [{"id": "dup", "image_base64": _OK_B64}],
                },
                {
                    "page_idx": 1,
                    "markdown": "![two](dup.png)",
                    "images": [{"id": "dup.png", "image_base64": _OK_B64}],
                },
            ],
        }
    )

    return docs


_WORDS = (
    "spark engine batch stream column row table join filter sort agg window "
    "hash merge scan shuffle page image figure chart table data value key"
).split()


def random_documents(n: int, seed: int = 42) -> list[dict[str, Any]]:
    """Seeded random ocr_pages documents mixing every payload/id/ref style."""
    rng = random.Random(seed)
    docs: list[dict[str, Any]] = []
    for i in range(n):
        n_pages = rng.randint(1, 5)
        pages = []
        for p in range(n_pages):
            lines = [f"{'#' * rng.randint(1, 4)} {' '.join(rng.sample(_WORDS, 3))}"]
            images = []
            for k in range(rng.randint(0, 4)):
                style = rng.randrange(6)
                img_id: Any
                if style == 0:
                    img_id = None
                    ref_id = f"img-p{p + 1}-{k + 1}.png"
                elif style == 1:
                    img_id = f"fig_{i}_{p}_{k}"  # extension-less
                    ref_id = img_id if rng.random() < 0.5 else img_id  # bare
                elif style == 2:
                    img_id = f"im?g:{i}|{p}{k}.png"  # needs sanitizing
                    ref_id = img_id
                else:
                    img_id = f"img_{i}_{p}_{k}.{rng.choice(['png','jpg','gif','bmp'])}"
                    ref_id = img_id
                b64_style = rng.randrange(5)
                if b64_style == 0:
                    b64 = _OK_B64
                elif b64_style == 1:
                    b64 = "data:image/jpeg;base64," + _OK_B64
                elif b64_style == 2:
                    b64 = _whitespaced(_OK_B64)
                elif b64_style == 3:
                    b64 = _unpadded(_OK_B64)
                else:
                    b64 = _SMALL_B64  # rejected
                images.append({"id": img_id, "image_base64": b64})
                prefix = (
                    f"https://cdn{i}.example/a/b/" if rng.random() < 0.3 else ""
                )
                alt = " ".join(rng.sample(_WORDS, 2)) if rng.random() < 0.8 else ""
                lines.append(f"![{alt}]({prefix}{ref_id})")
                lines.append(" ".join(rng.choices(_WORDS, k=rng.randint(4, 12))))
            if rng.random() < 0.1:
                lines.append("![ghost](missing-" + str(rng.randrange(99)) + ")")
            md = "\n\n".join(lines)
            pages.append(
                {
                    "page_idx": p,
                    "markdown": None if rng.random() < 0.05 else md,
                    "images": images,
                }
            )
        rng.shuffle(pages)
        suffix = ".pdf" if rng.random() < 0.3 else ""
        docs.append(
            {"url": f"https://site{i % 7}.example/gen/doc-{i:04d}{suffix}", "pages": pages}
        )
    return docs
