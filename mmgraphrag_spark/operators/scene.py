"""Scene-graph construction from media spans (SURVEY.md §3.3, §2.3 C4, §2.9 L3-L6).

The reference runs YOLO segmentation + MLLM description per image
(img2graph.py:279-481). Neither model is available in this sandbox, so detection
is a pluggable backend:

  - DeterministicSceneBackend — derives objects from the caption text in closed
    form (the FIXTURES.md §2 stand-in); used by tests/bench. Real Spark plumbing
    (mapInPandas over media rows, explode, min-size filter) is identical for a
    real backend.
  - YoloMllmBackend — the production seam: consumes a binary image column
    (spark.read.format("binaryFile") / inline binary media), runs detection +
    captioning per Arrow batch. Stubbed: model weights/network unavailable here.

Graph synthesis mirrors img2graph.py:444-481: one '"ORI_IMG"' whole-image
entity per media span, one '"IMG_ENTITY"' node per kept object, containment
edges with weight 10 (img2graph.py:473-479).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAPTION_ENTITY_RE = re.compile(r"ENTITY_(\d+)")

class DeterministicSceneBackend:
    """Caption-derived objects; emits one undersized noise row per image to
    exercise the min-size filter (img2graph.py:363-365)."""

    def map_batches(self, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_ref": [], "object_id": [], "label": [],
                   "description": [], "width": [], "height": []}
            for media_ref, caption in zip(pdf["media_ref"], pdf["caption"]):
                ks = sorted({int(k) for k in _CAPTION_ENTITY_RE.findall(caption or "")})
                for i, k in enumerate(ks):
                    out["media_ref"].append(media_ref)
                    out["object_id"].append(i)
                    out["label"].append(f"ENTITY_{k} (IMAGE)")
                    out["description"].append(
                        f"object depicting ENTITY_{k} in {media_ref}"
                    )
                    out["width"].append(64)
                    out["height"].append(64)
                out["media_ref"].append(media_ref)
                out["object_id"].append(len(ks))
                out["label"].append("NOISE (IMAGE)")
                out["description"].append("tiny artifact")
                out["width"].append(16)
                out["height"].append(16)
            yield pd.DataFrame(out)

class YoloMllmBackend:
    """Production detection backend over binary image content.

    Would decode bytes (PIL), run YOLOv8-seg, crop masks, and describe crops
    with an MLLM (img2graph.py:279-385). Requires model weights + network —
    unavailable in this sandbox.
    """

    def map_batches(self, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "YoloMllmBackend needs YOLO weights and an MLLM endpoint; "
            "use DeterministicSceneBackend offline"
        )

def describe_media(
    media_spans: DataFrame, describer, media_bytes: DataFrame | None = None
) -> DataFrame:
    """L3: MLLM description + segmentation flag per media span (reference
    pdf2md_preprocessing.py:177-198). ``describer.describe(caption, context,
    image_b64)`` returns (description, segmentation); the flag REPLACES the
    default-True ``segmentation`` column and the description lands in
    ``mllm_description`` (consumed by scene_graph for the ORI_IMG node).

    ``media_bytes`` (media_ref, content binary — e.g. read_docx_media /
    read_pdf_media output) joins on media_ref and rides to the describer as
    base64 (P22; the reference base64-encodes the image file for the MLLM
    call). Encoding happens JVM-side (F.base64) so only the final string
    crosses into Python. Arrow-batched; partitions pinned."""
    import pandas as pd

    cols = media_spans.columns
    src = media_spans
    if media_bytes is not None:
        b64 = media_bytes.select(
            "media_ref", F.base64(F.col("content")).alias("_img_b64")
        )
        src = media_spans.join(b64, "media_ref", "left")
    else:
        src = media_spans.withColumn("_img_b64", F.lit(None).cast("string"))

    def run(batches):
        for pdf in batches:
            descs, segs = [], []
            for caption, context, b in zip(
                pdf["caption"], pdf["context"], pdf["_img_b64"]
            ):
                d, s = describer.describe(caption or "", context or "", b)
                descs.append(d)
                segs.append(s)
            out = pdf.copy()
            out["segmentation"] = segs
            out["mllm_description"] = descs
            yield out[cols + ["mllm_description"]]

    # derive the output schema from the INPUT schema (plus the new column) —
    # a hand-rolled name-to-type map would silently mistype any future column
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media_spans.schema
    ) + ", mllm_description string"
    n_parts = media_spans.sparkSession.sparkContext.defaultParallelism
    return src.repartition(n_parts, "media_ref").mapInPandas(run, out_schema)


def extract_image_mentions(
    media_spans: DataFrame,
    backend,
    objects: DataFrame | None = None,
    media_bytes: DataFrame | None = None,
    min_size: int = 28,
) -> DataFrame:
    """L4-L6 LLM image extraction: media spans (+ detected objects as the
    crop inventory, + optional image bytes) -> (chunk_id=media_ref, doc_id,
    records) wire strings via ``backend.map_batches``
    (backends.llm.MllmImageExtractor). Downstream, extract.parse_mentions
    turns the records into mention rows with source_id = media_ref — the
    image-side twin of the text extraction path.

    Spark-side responsibilities (all JVM, before any Python):
      - the reference's >28x28 crop gate (img2graph.py:362-365) filters the
        object inventory so undersized crops never reach a paid call;
      - crop naming ``{media_ref}_{label}-{object_id}.jpg`` mirrors the
        reference's ``{img_name}_{label}-{ci}.jpg`` save paths
        (img2graph.py:342);
      - crops aggregate to ONE array per media span (sorted by object_id for
        deterministic call order) so the UDF sees one row per image;
      - whole-image bytes and, when a detection backend supplies a
        ``crop_b64`` column, per-crop bytes ride as base64 encoded JVM-side;
      - partitions pinned before the python stage (CLAUDE.md rule 3)."""
    objs = objects if objects is not None else detect_scene_objects(media_spans)
    # PER IMAGE, not per occurrence: media_spans (and therefore the detected
    # object inventory) carries one row per media-span occurrence, but the
    # reference processes each image FILE once (img2graph.py:648-660 iterates
    # jpg files) — without the dedup an image occurring N times would fire N
    # paid extract_image calls, each over N copies of every crop
    # DETERMINISTIC survivor per (media_ref, object_id): the same image part
    # at different positions can carry different captions, so a caption-aware
    # detector emits different rows for the same key — dropDuplicates would
    # keep an arbitrary one per task ordering, breaking resume-equals-fresh
    # and incremental-equals-batch. min-struct picks the lexicographic min.
    other = [c for c in objs.columns if c not in ("media_ref", "object_id")]
    kept = (
        objs.filter((F.col("width") > min_size) & (F.col("height") > min_size))
        .groupBy("media_ref", "object_id")
        .agg(F.min(F.struct(*other)).alias("_o"))
        .select("media_ref", "object_id", *[F.col(f"_o.{c}").alias(c) for c in other])
    )
    crop_name = F.concat(
        F.col("media_ref"), F.lit("_"), F.col("label"), F.lit("-"),
        F.col("object_id").cast("string"), F.lit(".jpg"),
    )
    crop_b64 = (
        F.col("crop_b64") if "crop_b64" in objs.columns
        else F.lit(None).cast("string")
    )
    crops = kept.groupBy("media_ref").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("object_id").alias("ord"),
                    crop_name.alias("name"),
                    crop_b64.alias("b64"),
                )
            )
        ).alias("_crops_o")
    ).select(
        "media_ref",
        F.transform(
            F.col("_crops_o"),
            lambda c: F.struct(
                c["name"].alias("name"), c["b64"].alias("b64")
            ),
        ).alias("_crops"),
    )
    desc = (
        F.coalesce(F.col("mllm_description"), F.col("caption"), F.lit(""))
        if "mllm_description" in media_spans.columns
        else F.coalesce(F.col("caption"), F.lit(""))
    )
    src = (
        media_spans.select("media_ref", "doc_id", desc.alias("description"))
        .groupBy("media_ref")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("description").alias("description"),
        )
        .join(crops, "media_ref", "left")
    )
    if media_bytes is not None:
        src = src.join(
            media_bytes.select(
                "media_ref", F.base64(F.col("content")).alias("_img_b64")
            ),
            "media_ref",
            "left",
        )
    else:
        src = src.withColumn("_img_b64", F.lit(None).cast("string"))
    n_parts = media_spans.sparkSession.sparkContext.defaultParallelism
    return src.repartition(n_parts, "media_ref").mapInPandas(
        backend.map_batches, "chunk_id string, doc_id string, records string"
    )


def detect_scene_objects(media_spans: DataFrame, backend=None) -> DataFrame:
    """media_spans -> schema.SCENE_OBJECTS via Arrow-batched mapInPandas.

    The L3 segmentation gate (pdf2md_preprocessing.py:196-198 -> img2graph
    entry): object detection runs ONLY for spans whose ``segmentation`` flag
    is true — an MLLM that judged an image single-object (or a describer that
    said no) keeps just its ORI_IMG node."""
    backend = backend or DeterministicSceneBackend()
    schema = (
        "media_ref string, object_id int, label string, description string, "
        "width int, height int"
    )
    gated = media_spans
    if "segmentation" in media_spans.columns:
        gated = media_spans.filter(F.col("segmentation"))
    # pin partitions before the python stage (CLAUDE.md rule 3): the media
    # snapshot often arrives AQE-coalesced to 1-2 partitions, which would
    # serialize a real detection backend
    n_parts = media_spans.sparkSession.sparkContext.defaultParallelism
    return (
        gated.select("media_ref", "caption")
        .repartition(n_parts, "media_ref")
        .mapInPandas(backend.map_batches, schema)
    )

def scene_graph(
    media_spans: DataFrame, objects: DataFrame, min_size: int = 28
) -> tuple[DataFrame, DataFrame]:
    """(media_spans, scene objects) -> (image entity mention rows, image edge
    mention rows) — mention-shaped so the global A1/A2 merge (operators/merge.py)
    aggregates text- and image-side evidence in one pass.

    - P17 min-size filter: keep objects with width>min_size AND height>min_size.
    - ORI_IMG entity per media span named '"IMG_<media_ref>"' (img2graph.py:464).
    - IMG_ENTITY node per object, name = upper(label) quoted (img2graph.py:378).
    - containment edge ORI_IMG<->object, weight 10, order 1 (img2graph.py:473-479).
    source_id carries the media_ref (the media span is the provenance unit).
    """
    kept = objects.filter(
        (F.col("width") > min_size) & (F.col("height") > min_size)
    )
    ori_name = F.concat(F.lit('"IMG_'), F.col("media_ref"), F.lit('"'))
    obj_name = F.concat(F.lit('"'), F.upper(F.col("label")), F.lit('"'))

    # ORI_IMG description prefers the MLLM description when the describer ran
    # (reference: image_data description feeds img2graph), else the caption
    ori_desc = (
        F.coalesce(F.col("mllm_description"), F.col("caption"), F.lit(""))
        if "mllm_description" in media_spans.columns
        else F.coalesce(F.col("caption"), F.lit(""))
    )
    ent_mentions = media_spans.select(
        ori_name.alias("entity_name"),
        F.lit('"ORI_IMG"').alias("entity_type"),
        ori_desc.alias("description"),
        F.col("media_ref").alias("source_id"),
    ).unionByName(
        kept.select(
            obj_name.alias("entity_name"),
            F.lit('"IMG_ENTITY"').alias("entity_type"),
            F.col("description"),
            F.col("media_ref").alias("source_id"),
        )
    )

    rel_mentions = kept.select(
        F.least(ori_name, obj_name).alias("src"),
        F.greatest(ori_name, obj_name).alias("tgt"),
        F.lit("contains").alias("description"),
        F.lit(10.0).alias("weight"),
        F.col("media_ref").alias("source_id"),
    )
    return ent_mentions, rel_mentions
