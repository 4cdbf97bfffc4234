"""Grouped-map assembly: exploded ``ocr_pages`` rows -> documents.

The alternative pipeline shape SURVEY §2 declares ("grouped-map
applyInPandas — per-document assembly if exploded"): when the per-page
intermediate is materialized as a relational table (FIXTURES.md §2 —
``url, page_idx, markdown, images array<struct<id,image_base64>>``), the
deterministic MarkMuse tail runs as a grouped-map over ``groupBy(url)``,
one pandas frame per document, byte-identical to the fused
``operators.extract`` path (tested against the golden oracle).

Use this path when pages arrive from a separate upstream stage (e.g. an
actual OCR service writing per-page rows); the fused kernel path avoids
the groupBy shuffle when payload -> document runs in one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from markmuse_spark.kernel.markdown_assembly import assemble_one

RESULT_DDL = "url string, markdown string, extracted_text string, n_images int"


def assemble_documents(ocr_pages: DataFrame) -> DataFrame:
    """``(url, page_idx, markdown, images)`` rows -> one document per url."""
    import pandas as pd

    def per_url(pdf: "pd.DataFrame") -> "pd.DataFrame":
        url = pdf["url"].iloc[0]
        pages = []
        for r in pdf.itertuples(index=False):
            images = [
                {"id": img["id"], "image_base64": img["image_base64"]}
                for img in (r.images if r.images is not None else [])
            ]
            pages.append(
                {
                    "page_idx": int(r.page_idx),
                    "markdown": r.markdown,
                    "images": images,
                }
            )
        doc = assemble_one(url, pages)
        return pd.DataFrame(
            [
                {
                    "url": url,
                    "markdown": doc["markdown"],
                    "extracted_text": doc["extracted_text"],
                    "n_images": len(doc["image_manifest"]),
                }
            ]
        )

    return (
        ocr_pages.select("url", "page_idx", "markdown", "images")
        .groupBy("url")
        .applyInPandas(per_url, RESULT_DDL)
    )
