"""Fixture-minting oracle: faithful re-implementation of the reference's
deterministic post-OCR tail.

Semantics transcribed (NOT copied) from the reference at /root/reference/:

* image normalization   -> ``markmuse.py:385-460`` (``_process_single_image``,
  local-storage path, ``enhance_images=False``)
* image-map build       -> ``markmuse.py:344-369`` (``save_images_from_ocr``:
  dual-keying of extension-less ids at ``:366-368``)
* link-rewrite join     -> ``markmuse.py:616-666`` (``replace_image_link`` +
  the global ``re.sub`` at ``:666``; left-outer: unmatched refs kept verbatim
  at ``:662``)
* page concatenation    -> ``markmuse.py:558-614`` (pages with a ``markdown``
  attribute, in page order, joined with ``"\\n\\n"`` at ``:614``)
* plain-text projection -> ``markmuse.py:477-479`` (image links then
  markdown-format chars stripped)
* output-stem derivation-> ``markmuse.py:704-720`` (extended: non-.pdf URL
  segments pass through instead of collapsing to ``"pdf_from_url"`` so stems
  stay unique per url; documented divergence)

This module mints the ``golden_markdown`` fixtures (FIXTURES.md section 3).
The production kernel (``markmuse_spark.kernel.markdown_assembly``) is an
independent implementation tested byte-for-byte against this oracle.

One deliberate determinism fix vs the reference: the reference fills its
image map from a thread pool in ``as_completed`` order (``markmuse.py:361``),
so colliding image ids resolve nondeterministically there.  Here images are
processed strictly in (page_idx, img_idx) order and later entries win.
"""

from __future__ import annotations

import base64
import re
from typing import Any, Optional

# markmuse.py:367 and :396 — the 7-extension test used for dual-keying and
# safe-filename normalization.
_EXT7 = re.compile(r"\.(jpg|jpeg|png|gif|webp|bmp|tiff)$", re.IGNORECASE)
# markmuse.py:584 and :640 — the *shorter* 5-extension list used when probing.
_EXT5 = re.compile(r"\.(jpg|jpeg|png|gif|webp)$", re.IGNORECASE)
# markmuse.py:393 — filename sanitizer.
_SANITIZE = re.compile(r"[\\/*?:'\"<>|]")
# markmuse.py:571 and :666 — markdown image-reference pattern.
_IMG_LINK = re.compile(r"!\[([^\]]*)\]\(([^)]+)\)")
# markmuse.py:585 and :641 — probe order for extension-less ids.
_PROBE_EXTS = (".png", ".jpg", ".jpeg", ".gif", ".webp")
# markmuse.py:477 and :479 — plain-text projection.
_IMG_STRIP = re.compile(r"!\[.*?\]\(.*?\)")
_FMT_STRIP = re.compile(r"[#*_`~]")


def normalize_image(
    page_idx: int, img_idx: int, img_id: Optional[str], image_base64: Optional[str]
) -> Optional[tuple[str, str, str, bytes]]:
    """Replicate ``markmuse.py:385-460`` (local-storage, no LLM enhancement).

    Returns ``(img_id, safe_filename, content_type, data)`` or ``None`` when
    the reference would drop the image (missing/corrupt base64, decoded
    payload < 100 bytes, or any exception along the way).
    """
    try:
        if img_id is None:
            # default id when the attribute is missing — markmuse.py:390
            img_id = f"img-p{page_idx + 1}-{img_idx + 1}.png"
        safe_filename = _SANITIZE.sub("_", img_id)  # markmuse.py:393
        if not _EXT7.search(safe_filename):  # markmuse.py:396-397
            safe_filename += ".png"
        if not image_base64:  # markmuse.py:402-403 (None and "" both drop)
            return None
        # data-URI detection — markmuse.py:406-410
        if "," in image_base64 and ";base64," in image_base64:
            content_type = image_base64.split(";")[0].split(":")[1]
            payload = image_base64.split(",", 1)[1]
        else:
            content_type = "image/png"
            payload = image_base64
        # whitespace cleanup + decode with padding repair — markmuse.py:412-426
        cleaned = "".join(payload.split())
        try:
            data = base64.b64decode(cleaned)
        except Exception:
            try:
                rem = len(cleaned) % 4
                if rem:
                    cleaned += "=" * (4 - rem)
                data = base64.b64decode(cleaned)
            except Exception:
                return None
        if len(data) < 100:  # markmuse.py:429-430
            return None
        return img_id, safe_filename, content_type, data
    except Exception:
        # outer catch-all — markmuse.py:524-526
        return None


def build_image_map(pages: list[dict[str, Any]]) -> tuple[dict[str, str], list[dict]]:
    """Replicate ``save_images_from_ocr`` (``markmuse.py:307-383``).

    ``pages``: list of ``{"page_idx": int, "markdown": str|None,
    "images": [{"id": str|None, "image_base64": str|None}, ...]}``.

    Returns ``(image_map, manifest)`` where ``image_map`` maps image id (and
    the dual ``id + '.png'`` key for extension-less ids, markmuse.py:366-368)
    to the *safe filename*, and ``manifest`` lists the kept images in
    (page_idx, img_idx) order.
    """
    image_map: dict[str, str] = {}
    manifest: list[dict] = []
    for page in sorted(pages, key=lambda p: p["page_idx"]):
        for img_idx, img in enumerate(page.get("images") or []):
            res = normalize_image(
                page["page_idx"], img_idx, img.get("id"), img.get("image_base64")
            )
            if res is None:
                continue
            img_id, safe_filename, content_type, data = res
            image_map[img_id] = safe_filename
            if not _EXT7.search(img_id):
                image_map[img_id + ".png"] = safe_filename
            manifest.append(
                {
                    "img_id": img_id,
                    "safe_filename": safe_filename,
                    "content_type": content_type,
                    "n_bytes": len(data),
                }
            )
    return image_map, manifest


def rewrite_links(markdown: str, image_map: dict[str, str], stem: str) -> str:
    """Replicate the non-enhanced link rewrite (``markmuse.py:616-666``).

    Matched refs become ``![alt]({stem}_images/{safe_filename})`` — the
    relative path the reference computes via ``os.path.relpath``
    (``markmuse.py:657-660``); unmatched refs are kept verbatim
    (``markmuse.py:662``).
    """

    def _replace(m: "re.Match[str]") -> str:
        alt_text, original_url = m.group(1), m.group(2)
        # last-segment id extraction — markmuse.py:621-625
        img_id = original_url.split("/")[-1] if "/" in original_url else original_url
        safe: Optional[str] = None
        if img_id in image_map:  # direct probe — markmuse.py:632
            safe = image_map[img_id]
        elif not _EXT5.search(img_id):  # fallback probes — markmuse.py:640-649
            for ext in _PROBE_EXTS:
                if img_id + ext in image_map:
                    safe = image_map[img_id + ext]
                    break
        if safe is None:
            return m.group(0)
        return f"![{alt_text}]({stem}_images/{safe})"

    return _IMG_LINK.sub(_replace, markdown)


def plain_text(markdown: str) -> str:
    """Plain-text projection — ``markmuse.py:477-479``."""
    return _FMT_STRIP.sub("", _IMG_STRIP.sub("", markdown))


def output_stem(url: str) -> str:
    """Output-stem derivation from a url — ``markmuse.py:704-720``.

    Bug-compatible detail: ``.replace('.pdf', '')`` removes *every*
    ``'.pdf'`` occurrence, and only when the segment ends ``.pdf``
    case-insensitively (an upper-case ``.PDF`` suffix survives the replace).
    Divergence: a non-``.pdf`` segment passes through unchanged (the
    reference collapses it to ``"pdf_from_url"``, which would collide for
    every HTML url in the table).
    """
    seg = url.split("/")[-1]
    if not seg:
        return "pdf_from_url"  # markmuse.py:709-710
    if seg.lower().endswith(".pdf"):
        return seg.replace(".pdf", "")  # markmuse.py:712
    return seg


def assemble_document_enhanced(
    url: str, pages: list[dict[str, Any]], captions: Optional[dict[str, str]]
) -> dict[str, Any]:
    """Enhanced-mode tail (``markmuse.py:569-608``): per-page link rewrite
    with caption injection, the global ``re.sub`` SKIPPED
    (``markmuse.py:664-666`` — enhanced mode replaces matched refs
    in-page via ``str.replace`` and leaves everything else verbatim,
    including matched-but-undescribed refs).

    ``captions`` maps the image's primary id (manifest ``img_id``) to its
    description — the reference fills this from the LLM
    (``markmuse.py:462-503``); here it is an injected input so the tail
    stays deterministic (the LLM is the pluggable seam, see
    ``operators/extract.deterministic_captions``).
    """
    stem = output_stem(url)
    image_map, manifest = build_image_map(pages)
    desc = captions or {}
    # image_map key -> (safe_filename, description): dual keys share the
    # primary id's description, as the reference's shared info dict does
    by_primary = {m["img_id"]: m["safe_filename"] for m in manifest}
    enhanced_map: dict[str, tuple[str, Optional[str]]] = {}
    for img_id, safe in by_primary.items():
        d = desc.get(img_id)
        enhanced_map[img_id] = (safe, d)
        if not _EXT7.search(img_id):
            enhanced_map[img_id + ".png"] = (safe, d)

    n_enhanced = 0
    contents: list[str] = []
    for page in sorted(pages, key=lambda p: p["page_idx"]):
        md = page.get("markdown")
        if md is None:
            continue
        for alt_text, img_url in _IMG_LINK.findall(md):
            img_id = img_url.split("/")[-1] if "/" in img_url else img_url
            info: Optional[tuple[str, Optional[str]]] = None
            if img_id in enhanced_map:  # markmuse.py:580-581
                info = enhanced_map[img_id]
            elif not _EXT5.search(img_id):  # markmuse.py:583-588
                for ext in _PROBE_EXTS:
                    if img_id + ext in enhanced_map:
                        info = enhanced_map[img_id + ext]
                        break
            if info is None or info[1] is None:
                continue  # unmatched OR undescribed: left verbatim (:590)
            safe, description = info
            new_ref = (
                f"![{alt_text}]({stem}_images/{safe})\n\n"
                f"**AI图片分析**：{description}\n"
            )  # markmuse.py:599-604
            old_ref = f"![{alt_text}]({img_url})"
            if old_ref in md:
                n_enhanced += md.count(old_ref)
            md = md.replace(old_ref, new_ref)  # markmuse.py:606-608
        contents.append(md)
    markdown = "\n\n".join(contents)  # markmuse.py:614 (no global rewrite)
    return {
        "url": url,
        "markdown": markdown,
        "extracted_text": plain_text(markdown),
        "image_manifest": manifest,
        "n_enhanced": n_enhanced,
    }


def assemble_document(url: str, pages: list[dict[str, Any]]) -> dict[str, Any]:
    """Full deterministic tail for one document — the golden-fixture mint.

    Composition of ``create_markdown_from_ocr`` (``markmuse.py:528-685``,
    ``enhance_images=False``): image-map build, page concat in page order
    (pages whose ``markdown`` is None are skipped entirely,
    ``markmuse.py:563-564``), global link rewrite, plain-text projection.
    """
    stem = output_stem(url)
    image_map, manifest = build_image_map(pages)
    ordered = sorted(pages, key=lambda p: p["page_idx"])
    all_content = [p["markdown"] for p in ordered if p.get("markdown") is not None]
    markdown = "\n\n".join(all_content)  # markmuse.py:614
    markdown = rewrite_links(markdown, image_map, stem)
    return {
        "url": url,
        "markdown": markdown,
        "extracted_text": plain_text(markdown),
        "image_manifest": manifest,
    }
