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
