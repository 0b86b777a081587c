r"""Caption provenance carried inside the image payload, oracle-gated.

The input_hint's per-row invariant is decoded-pixel equality PLUS
caption equality. The image table keeps the caption as a COLUMN; a
production pipeline also stamps it INTO the payload (PNG ``iTXt``
chunks — the provenance survives when the bytes leave the table, e.g.
through the WARC fetch log). This query round-trips that: render each
doc's PNG with Title=caption and Source=url text chunks
(sources/synthetic_images.py ``png_with_text``), parse the chunks
back (``read_png_text``, CRC-verified), decode the pixels past the
spliced chunks, and check caption equality char-for-char. The oracle
states the closed form (caption = first 64 chars of the doc text; a
correct round trip preserves every image, every caption, every
pixel).

Scale shape: one mapInPandas pass, encode+parse+decode per payload in
the same Arrow batch; the aggregate is a single partial-agg reduce —
no shuffle of payload bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, register
from gocrawler_spark.sources import synthetic_images as SI


@register(
    "image_caption_provenance",
    """
SELECT CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(*) AS BIGINT) AS n_caption_ok,
       CAST(count(*) AS BIGINT) AS n_decode_ok,
       CAST(sum(length(substr(text, 1, 64))) AS BIGINT)
         AS sum_caption_chars
FROM documents
""",
)
def image_caption_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cap_ok, dec_ok, cap_len = [], [], []
            for r in pdf.itertuples(index=False):
                doc_id = int(r.doc_id)
                caption = str(r.text)[:64]
                w, h = 16 + doc_id % 49, 16 + (doc_id * 7) % 49
                px = SI.render_pixels(str(doc_id), w, h)
                data = SI.png_with_text(
                    px,
                    {
                        "Title": caption,
                        "Source": f"https://l{doc_id % 7}.example/d{doc_id}",
                    },
                )
                parsed = SI.read_png_text(data)
                got = parsed.get("Title", "")
                cap_ok.append(int(got == caption))
                dec_ok.append(
                    int(np.array_equal(SI.decode_png(data), px))
                )
                cap_len.append(len(got))
            yield pd.DataFrame(
                {
                    "caption_ok": cap_ok,
                    "decode_ok": dec_ok,
                    "caption_chars": cap_len,
                }
            )

    per = docs.mapInPandas(
        gen, "caption_ok long, decode_ok long, caption_chars long"
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("caption_ok").alias("n_caption_ok"),
        F.sum("decode_ok").alias("n_decode_ok"),
        F.sum("caption_chars").alias("sum_caption_chars"),
    ).select(
        "n_images", "n_caption_ok", "n_decode_ok", "sum_caption_chars"
    )


@register(
    "image_privacy_strip",
    """
SELECT CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(*) AS BIGINT) AS n_pixels_ok,
       CAST(count(*) AS BIGINT) AS n_clean,
       CAST(SUM(45 + strlen(substr(text, 1, 64))
                   + strlen('https://img.local/' || CAST(doc_id AS VARCHAR)))
            AS BIGINT) AS sum_bytes_removed
FROM documents
""",
)
def image_privacy_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXIF-strip privacy pass: payloads arrive with provenance
    text chunks baked in (Title=caption, Source=crawl URL — what a
    polite crawler stamps, image_caption_provenance); before the table
    ships as training data every text chunk must come OUT. Decode
    stays byte-exact (pixels untouched), the stripped payload parses
    clean, and the reclaimed bytes are accounted per row.

    Oracle: the iTXt layout makes the overhead exact arithmetic —
    12 (len+tag+crc) + keyword + 5 (flags) + UTF-8 text per chunk, so
    45 + strlen(caption) + strlen(url) per image — restated in SQL
    over the same documents columns; the pixel/clean flags are
    invariants (count(*)), enforced row-by-row engine-side.

    Scale: one mapInPandas pass, payload-local, no shuffle below the
    final 1-row aggregate."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pix = clean = 0
            removed = 0
            for r in pdf.itertuples(index=False):
                d = int(r.doc_id)
                px = SI.render_pixels(str(d), 16, 16)
                cap = (r.text or "")[:64]
                url = f"https://img.local/{d}"
                stamped = SI.png_with_text(px, {"Title": cap, "Source": url})
                stripped = SI.strip_png_text(stamped)
                n += 1
                removed += len(stamped) - len(stripped)
                if np.array_equal(SI.decode_png(stripped), px):
                    pix += 1
                if SI.read_png_text(stripped) == {}:
                    clean += 1
            yield pd.DataFrame(
                {
                    "n": [n],
                    "pix": [pix],
                    "clean": [clean],
                    "removed": [removed],
                }
            )

    part = docs.mapInPandas(gen, "n long, pix long, clean long, removed long")
    return part.agg(
        F.sum("n").alias("n_images"),
        F.sum("pix").alias("n_pixels_ok"),
        F.sum("clean").alias("n_clean"),
        F.sum("removed").alias("sum_bytes_removed"),
    )
