"""LLM backend tests against an injected fake transport (no network)."""

from __future__ import annotations

import json

import pytest

from mmgraphrag_spark.backends.llm import ChatClient, LLMExtractor, ScriptedTransport


def make_client(script):
    """script: list of reply strings, consumed in order."""
    t = ScriptedTransport(script)
    client = ChatClient("http://fake", transport=t)
    client.backoff_seconds = 0.0
    return client, t


def test_retry_then_success():
    client, t = make_client([RuntimeError("rate limited"), "ok"])
    assert client.complete([{"role": "user", "content": "x"}]) == "ok"
    assert t.n == 2


def test_retries_exhausted():
    client, _ = make_client([RuntimeError("boom")])
    with pytest.raises(RuntimeError):
        client.complete([{"role": "user", "content": "x"}])


def test_gleaning_loop_appends_rounds(spark):
    rec1 = '("entity"<|>"A"<|>"PERSON"<|>first)<|COMPLETE|>'
    rec2 = '("entity"<|>"B"<|>"GEO"<|>gleaned)<|COMPLETE|>'
    # reference order at max_gleaning=1: extraction -> one unconditional
    # continuation, NO probe (text2graph.py:352-369)
    client, calls = make_client([rec1, rec2])
    extractor = LLMExtractor(client, max_gleaning=1)
    chunks = spark.createDataFrame(
        [("c1", "d1", "some text")], ["chunk_id", "doc_id", "content"]
    )
    from mmgraphrag_spark.operators.extract import extract_mentions, parse_mentions

    mentions = extract_mentions(chunks, backend=extractor)
    ents, _ = parse_mentions(mentions)
    names = {r.entity_name for r in ents.collect()}
    assert names == {'"A"', '"B"'}  # both rounds parsed from one wire string


# -- exact call-sequence tests of the reference gleaning order (driver-side,
#    no Spark: _extract_one is the executor-side unit) -----------------------

def _last_user(messages):
    return [m for m in messages if m["role"] == "user"][-1]["content"]


def test_gleaning_max1_exact_sequence():
    """max_gleaning=1: exactly 2 calls — extraction, then one UNCONDITIONAL
    continuation. The probe is never sent (text2graph.py:358-360: the
    last-round break precedes the probe)."""
    from mmgraphrag_spark.backends import prompts

    client, t = make_client(["r1", "r2"])
    out = LLMExtractor(client, max_gleaning=1)._extract_one("some text")
    assert out == "r1##r2"
    assert t.n == 2
    assert "some text" in _last_user(t.calls[0])
    assert _last_user(t.calls[1]) == prompts.CONTINUE_EXTRACTION


def test_gleaning_max2_probe_yes_sequence():
    """max_gleaning=2, probe answers "yes": extraction, continuation, probe,
    second continuation — 4 calls; probe exchange NOT in later history."""
    from mmgraphrag_spark.backends import prompts

    client, t = make_client(["r1", "r2", '"yes"', "r3"])
    out = LLMExtractor(client, max_gleaning=2)._extract_one("txt")
    assert out == "r1##r2##r3"
    assert t.n == 4
    assert _last_user(t.calls[1]) == prompts.CONTINUE_EXTRACTION
    assert _last_user(t.calls[2]) == prompts.LOOP_PROBE
    assert _last_user(t.calls[3]) == prompts.CONTINUE_EXTRACTION
    # the probe Q/A must not appear in the 4th call's history
    assert all(prompts.LOOP_PROBE != m["content"] for m in t.calls[3])


def test_gleaning_max2_probe_no_stops():
    """max_gleaning=2, probe answers anything but exact "yes": 3 calls, second
    continuation skipped."""
    client, t = make_client(["r1", "r2", "NO"])
    out = LLMExtractor(client, max_gleaning=2)._extract_one("txt")
    assert out == "r1##r2"
    assert t.n == 3


def test_gleaning_zero_rounds():
    """max_gleaning=0: single extraction call only."""
    client, t = make_client(["r1"])
    assert LLMExtractor(client, max_gleaning=0)._extract_one("txt") == "r1"
    assert t.n == 1


# -- P16 JSON salvage ---------------------------------------------------------

def test_salvage_json():
    from mmgraphrag_spark.backends.llm import salvage_json

    assert salvage_json('noise {"a": 1, "b": [2]} trailing') == {"a": 1, "b": [2]}
    assert salvage_json("no json here") is None
    assert salvage_json('{"broken": ') is None
    assert salvage_json("") is None


def test_salvage_json_list():
    from mmgraphrag_spark.backends.llm import salvage_json_list

    assert salvage_json_list('reply: [{"x": 1}, {"y": 2}] done') == [{"x": 1}, {"y": 2}]
    # truncation comma stripped
    assert salvage_json_list('[{"x": 1}, ]') == [{"x": 1}]
    # item-by-item fallback recovers the complete prefix of a truncated list
    assert salvage_json_list('[{"x": 1}, {"y": 2}, {"z":') == [{"x": 1}, {"y": 2}]
    assert salvage_json_list("nothing") == []


# -- L3 MLLM describer --------------------------------------------------------

def test_mllm_describer_parses_fields():
    from mmgraphrag_spark.backends.llm import ChatClient, MllmDescriber, ScriptedTransport

    reply = '{"description": "two cats on a mat", "segmentation": true}'
    client = ChatClient("http://fake", transport=ScriptedTransport([reply]))
    d, s = MllmDescriber(client).describe("cats", "context text")
    assert d == "two cats on a mat" and s is True

    client2 = ChatClient("http://fake", transport=ScriptedTransport(["garbled reply"]))
    d2, s2 = MllmDescriber(client2).describe("x", "y")
    assert d2 == "No description." and s2 is False


# -- L12/L13 LLM answerer -----------------------------------------------------

def test_llm_answerer_merge_sequence():
    """Reference two-step merge: per-image answers merged first, then merged
    with the text answer; single answer short-circuits with no calls."""
    from mmgraphrag_spark.backends import prompts
    from mmgraphrag_spark.backends.llm import ChatClient, LLMAnswerer, ScriptedTransport

    t = ScriptedTransport(["mm merged", "final"])
    a = LLMAnswerer(ChatClient("http://fake", transport=t))
    out = a.merge("q?", ["text ans", "img1 ans", "img2 ans"])
    assert out == "final"
    assert t.n == 2
    first, second = t.calls[0][-1]["content"], t.calls[1][-1]["content"]
    assert "img1 ans" in first and "img2 ans" in first and "text ans" not in first
    assert "mm merged" in second and "text ans" in second

    t2 = ScriptedTransport(["never"])
    a2 = LLMAnswerer(ChatClient("http://fake", transport=t2))
    assert a2.merge("q?", ["only"]) == "only"
    assert t2.n == 0


def test_llm_cache_namespace(spark):
    """J17 + separate multimodal cache namespace (img2graph.py:603-608): a
    cache row in another namespace must not satisfy this probe."""
    from pyspark.sql import functions as F

    from mmgraphrag_spark.functions import args_hash
    from mmgraphrag_spark.operators.extract import extract_mentions

    chunks = spark.createDataFrame(
        [("c1", "d1", "ENTITY_1 is a PERSON associated with topic_0.")],
        ["chunk_id", "doc_id", "content"],
    )
    h = chunks.select(args_hash(F.col("content")).alias("h")).first().h
    cache = spark.createDataFrame(
        [(h, "cached-records", "mm")], ["args_hash", "payload", "namespace"]
    )
    out = extract_mentions(chunks, llm_cache=cache, cache_namespace="text").first()
    assert out.records != "cached-records"  # mm hit doesn't serve text
    out2 = extract_mentions(chunks, llm_cache=cache, cache_namespace="mm").first()
    assert out2.records == "cached-records"


# -- P15 + L4-L6 image extraction ---------------------------------------------

def test_format_result():
    """P15 (img2graph.py:483-487): entity records project to '"name"-"desc"'
    lines; relationship records and malformed pieces are ignored."""
    from mmgraphrag_spark.backends.llm import format_result

    raw = (
        '("entity"<|>"Apple"<|>"object"<|>"A green apple.")##'
        '("relationship"<|>"Apple"<|>"Book"<|>"stacked"<|>7)##'
        '("entity"<|>"Book"<|>"object"<|>"Three stacked books.")<|COMPLETE|>'
    )
    assert format_result(raw) == (
        '"Apple"-"A green apple."\n"Book"-"Three stacked books."'
    )
    assert format_result("") == "" and format_result(None) == ""


def test_mllm_image_extractor_call_sequence():
    """Reference order (img2graph.py:509-514): L4 describe per crop, then ONE
    L5 whole-image extraction, then L6 alignment per crop — with the right
    system prompts, the P15 listing inside the alignment turn, and image
    bytes as image_url parts."""
    import base64

    from mmgraphrag_spark.backends import prompts
    from mmgraphrag_spark.backends.llm import (
        ChatClient,
        MllmImageExtractor,
        ScriptedTransport,
    )

    extraction = (
        '("entity"<|>"Girl"<|>"person"<|>"smiling")##'
        '("entity"<|>"Umbrella"<|>"object"<|>"black umbrella")##'
        '("relationship"<|>"Girl"<|>"Umbrella"<|>"holds"<|>9)<|COMPLETE|>'
    )
    align1 = '("relationship"<|>"Girl"<|>"img0_person-0.jpg"<|>"The image feature block img0_person-0.jpg is a picture of Girl."<|>8)##'
    align2 = '("relationship"<|>"Umbrella"<|>"img0_umbrella-1.jpg"<|>"The image feature block img0_umbrella-1.jpg is a picture of Umbrella."<|>7)##'
    t = ScriptedTransport(["a person", "an umbrella", extraction, align1, align2])
    ex = MllmImageExtractor(ChatClient("http://fake", transport=t))

    png_b64 = base64.b64encode(b"\x89PNG\r\n\x1a\nfake").decode()
    crops = [
        {"name": "img0_person-0.jpg", "b64": png_b64},
        {"name": "img0_umbrella-1.jpg", "b64": None},
    ]
    wire = ex.extract_image("img0.jpg", "a street scene", png_b64, crops)

    assert t.n == 5
    # calls 0-1: L4 describe (feature-image prompts; crop bytes as data URI)
    assert t.calls[0][0]["content"] == prompts.FEATURE_IMAGE_SYSTEM
    c0 = t.calls[0][1]["content"]
    assert isinstance(c0, list) and c0[1]["image_url"]["url"].startswith(
        "data:image/png;base64,"
    )
    assert t.calls[1][1]["content"] == prompts.FEATURE_IMAGE_USER  # no bytes
    # call 2: L5 whole image — entity types in the system turn
    assert "ORGANIZATION" in t.calls[2][0]["content"]
    # calls 3-4: L6 alignment — crop name + the P15 listing of L5's entities
    u3 = t.calls[3][1]["content"][0]["text"]
    assert "img0_person-0.jpg" in u3 and '"Girl"-"smiling"' in u3
    assert t.calls[3][0]["content"] == prompts.ENTITY_ALIGNMENT_SYSTEM

    # wire string: crop entity records, raw alignments, deterministic tail
    assert '("entity"<|>"img0_person-0.jpg"<|>"img"<|>"a person")##' in wire
    assert align1 in wire and align2 in wire
    assert '("entity"<|>"img0.jpg"<|>"ori_img"<|>"a street scene")##' in wire
    assert (
        '"img0_person-0.jpg"<|>"img0.jpg"<|>"img0_person-0.jpg is an image feature block of img0.jpg."<|>10' in wire
    )
    assert (
        '"Girl"<|>"img0.jpg"<|>"Girl is an entity extracted from img0.jpg."<|>10' in wire
    )
    assert wire.endswith(extraction.strip())


def test_extract_image_mentions_spark(spark):
    """Spark e2e for the L4-L6 path: media spans + detected objects ->
    wire records -> parse_mentions, with the >28x28 gate applied JVM-side
    and source_id = media_ref."""
    from mmgraphrag_spark.backends.llm import ChatClient, MllmImageExtractor, ScriptedTransport
    from mmgraphrag_spark.operators.extract import parse_mentions
    from mmgraphrag_spark.operators.scene import extract_image_mentions

    extraction = '("entity"<|>"Girl"<|>"person"<|>"smiling")<|COMPLETE|>'
    align = '("relationship"<|>"Girl"<|>"m1_person-0.jpg"<|>"The image feature block m1_person-0.jpg is a picture of Girl."<|>8)##'
    # one image, ONE kept crop (the 16x16 object is gated out): describe,
    # extract, align — replay keeps returning `align` if order drifted,
    # which the record assertions below would catch
    t = ScriptedTransport(["a person crop", extraction, align])
    backend = MllmImageExtractor(ChatClient("http://fake", transport=t))

    media = spark.createDataFrame(
        [("m1", "d1", "caption text", 0)],
        ["media_ref", "doc_id", "caption", "chunk_order_index"],
    )
    objects = spark.createDataFrame(
        [
            ("m1", 0, "person", "obj desc", 64, 64),
            ("m1", 1, "noise", "tiny", 16, 16),
        ],
        ["media_ref", "object_id", "label", "description", "width", "height"],
    )
    recs = extract_image_mentions(media, backend, objects=objects)
    ents, rels = parse_mentions(recs)
    e = {(r.entity_name, r.entity_type, r.source_id) for r in ents.collect()}
    assert ('"M1_PERSON-0.JPG"', '"IMG"', "m1") in e
    assert ('"M1.JPG"', '"ORI_IMG"', "m1") not in e  # image name is media_ref
    assert ('"M1"', '"ORI_IMG"', "m1") in e
    assert ('"GIRL"', '"PERSON"', "m1") in e
    r = {(x.src, x.tgt, x.weight) for x in rels.collect()}
    # crop containment + entity-extracted-from, weight 10; alignment weight 8
    assert ('"M1"', '"M1_PERSON-0.JPG"', 10.0) in r
    assert ('"GIRL"', '"M1"', 10.0) in r
    assert ('"GIRL"', '"M1_PERSON-0.JPG"', 8.0) in r


def test_extract_image_mentions_crop_bytes_column(spark):
    """C4 seam wiring: when the detection backend supplies a ``crop_b64``
    column, the per-crop bytes survive the JVM-side struct aggregation and
    reach the backend in object_id order."""
    from mmgraphrag_spark.operators.scene import extract_image_mentions

    class RecordingBackend:
        """Echoes what it received into the records column (defined inside
        the test so cloudpickle ships it by value)."""

        def map_batches(self, it):
            import pandas as pd

            for pdf in it:
                recs = []
                for ref, crops in zip(pdf["media_ref"], pdf["_crops"]):
                    crops = [] if crops is None else list(crops)
                    recs.append(
                        ";".join(f"{c['name']}={c['b64']}" for c in crops)
                    )
                yield pd.DataFrame(
                    {"chunk_id": pdf["media_ref"], "doc_id": pdf["doc_id"],
                     "records": recs}
                )

    media = spark.createDataFrame(
        [("m1", "d1", "cap", 0)],
        ["media_ref", "doc_id", "caption", "chunk_order_index"],
    )
    objects = spark.createDataFrame(
        [
            ("m1", 1, "cat", "d", 64, 64, "QkJC"),
            ("m1", 0, "dog", "d", 64, 64, "QUFB"),
            ("m1", 2, "tiny", "d", 8, 8, "Q0ND"),  # gated out (28x28)
        ],
        ["media_ref", "object_id", "label", "description", "width", "height",
         "crop_b64"],
    )
    out = extract_image_mentions(media, RecordingBackend(), objects=objects)
    rec = out.collect()[0].records
    assert rec == "m1_dog-0.jpg=QUFB;m1_cat-1.jpg=QkJC"


def test_extract_image_mentions_dedups_occurrences(spark):
    """A media ref occurring N times (several docs / repeated spans) must
    reach the paid backend ONCE, with each crop listed once — the reference
    processes each image file once (img2graph.py:648-660)."""
    from mmgraphrag_spark.operators.scene import extract_image_mentions

    class CountingBackend:
        def map_batches(self, it):
            import pandas as pd

            for pdf in it:
                yield pd.DataFrame(
                    {"chunk_id": pdf["media_ref"], "doc_id": pdf["doc_id"],
                     "records": [
                         f"ncrops={0 if c is None else len(list(c))}"
                         for c in pdf["_crops"]
                     ]}
                )

    media = spark.createDataFrame(
        [("m1", "d1", "cap", 0), ("m1", "d2", "cap", 3)],
        ["media_ref", "doc_id", "caption", "chunk_order_index"],
    )
    # object inventory duplicated per occurrence, as detect_scene_objects
    # emits it when fed per-occurrence media rows
    objects = spark.createDataFrame(
        [("m1", 0, "person", "d", 64, 64)] * 2 + [("m1", 1, "cat", "d", 64, 64)] * 2,
        ["media_ref", "object_id", "label", "description", "width", "height"],
    )
    out = extract_image_mentions(media, CountingBackend(), objects=objects).collect()
    assert len(out) == 1  # one backend row per IMAGE, not per occurrence
    assert out[0].records == "ncrops=2"  # each crop once, not once per occurrence


def test_extract_image_enforces_record_separator():
    """A raw L6 alignment reply WITHOUT the trailing '##' the prompt asks
    for must not merge with the next (deterministic ORI_IMG) record — the
    record parser splits on '##' only, so the separator is enforced on
    every raw reply (newlines are not separators)."""
    from mmgraphrag_spark.backends.llm import (
        ChatClient,
        MllmImageExtractor,
        ScriptedTransport,
    )

    align_no_sep = (
        '("relationship"<|>"Girl"<|>"img0_person-0.jpg"'
        '<|>"picture of Girl."<|>8)'  # no trailing ##
    )
    extraction = '("entity"<|>"Girl"<|>"person"<|>"smiling")##'
    t = ScriptedTransport(["a person", extraction, align_no_sep])
    ex = MllmImageExtractor(ChatClient("http://fake", transport=t))
    wire = ex.extract_image(
        "img0.jpg", "a scene", None, [{"name": "img0_person-0.jpg", "b64": None}]
    )
    assert align_no_sep + "##" in wire
    # the ORI_IMG record survives as its own record: split on '##' yields it
    recs = [r.strip() for r in wire.replace("<|COMPLETE|>", "##").split("##")]
    assert '("entity"<|>"img0.jpg"<|>"ori_img"<|>"a scene")' in recs
