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
