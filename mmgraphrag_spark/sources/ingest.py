"""File ingestion -> interleaved documents table (S1-S3 equivalents).

The reference ingests DOCX/PDF via python-docx / PyMuPDF / MinerU
(preprocessing.py:299-375, pdf_preprocessing.py:314-400,
pdf2md_preprocessing.py:317-457) — none of those libraries ship in this
container, and the MinerU path itself converts PDF -> markdown first. The
engine therefore ingests the COMMON DENOMINATOR those all produce: markdown /
plain text with inline image references. A production DOCX/PDF front-end
plugs in ahead of this (it only needs to emit markdown), exactly like the
reference's MinerU subprocess (S3).

``read_markdown_dir`` is fully distributed: wholetext file reads -> paragraph
split -> span classification, all JVM expressions; doc_id = "doc-" + md5(text)
(the reference's id derivation, preprocessing.py:107-110).

Markdown conventions handled:
  - paragraphs separated by blank lines become text spans
  - a paragraph that IS an image tag ``![caption](ref)`` becomes an image span
    (caption text kept — the reference's caption field)
  - inline image tags inside a paragraph are scrubbed from the text span and
    appended as separate image spans after it (P13 scrub, pdf2md:260-263)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_IMG_RE = r"!\[([^\]]*)\]\(([^)]*)\)"


def read_markdown_dir(spark: SparkSession, path: str, glob: str = "*.md") -> DataFrame:
    """Directory of markdown files -> documents(doc_id, spans)."""
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(f"{path}/{glob}")
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("text"),
        )
    )
    return markdown_to_documents(raw)


def markdown_to_documents(raw: DataFrame) -> DataFrame:
    """(file, text) -> documents(doc_id, spans). Pure DataFrame ops."""
    doc_id = F.concat(F.lit("doc-"), F.md5(F.col("text")))
    paras = F.split(F.col("text"), r"\n\s*\n")
    d = raw.select(doc_id.alias("doc_id"), F.posexplode(paras).alias("pord", "para"))
    d = d.withColumn("para", F.trim(F.col("para"))).filter(F.col("para") != "")

    # pure-image paragraph?
    is_img = F.col("para").rlike(r"^" + _IMG_RE + r"$")
    # text content with inline image tags scrubbed (P13)
    text_clean = F.trim(F.regexp_replace(F.col("para"), _IMG_RE, " "))
    # all image tags in the paragraph: array<struct<caption, ref>>
    caps = F.regexp_extract_all(F.col("para"), F.lit(_IMG_RE), 1)
    refs = F.regexp_extract_all(F.col("para"), F.lit(_IMG_RE), 2)
    imgs = F.zip_with(
        caps, refs,
        lambda c, r: F.struct(c.alias("caption"), r.alias("ref")),
    )

    # emit: one text sub-span (when non-empty) then the paragraph's image
    # sub-spans, in order
    text_span = F.when(
        (~is_img) & (text_clean != ""),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                text_clean.alias("text"),
                F.lit("").alias("media_ref"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string>>"))
    img_spans = F.transform(
        imgs,
        lambda s: F.struct(
            F.lit("image").alias("kind"),
            s.getField("caption").alias("text"),
            s.getField("ref").alias("media_ref"),
        ),
    )
    d = d.select(
        "doc_id", "pord", F.concat(text_span, img_spans).alias("sub")
    ).select("doc_id", "pord", F.posexplode("sub").alias("sord", "span"))

    # global span order per doc -> offset
    w = Window.partitionBy("doc_id").orderBy("pord", "sord")
    d = d.withColumn("offset", F.row_number().over(w) - 1)
    spans = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("span.kind").alias("kind"),
                F.col("span.text").alias("text"),
                F.col("span.media_ref").alias("media_ref"),
                F.col("offset").alias("offset"),
            )
        )
    )
    grouped = d.groupBy("doc_id").agg(spans.alias("_spans"))
    # array_sort on structs orders by fields in order (kind first) — re-sort by
    # offset explicitly via transform over a sorted index sequence
    by_offset = F.transform(
        F.array_sort(
            F.transform(
                F.col("_spans"),
                lambda s: F.struct(
                    s.getField("offset").alias("o"),
                    s.alias("s"),
                ),
            )
        ),
        lambda x: x.getField("s"),
    )
    return grouped.select("doc_id", by_offset.alias("spans"))
