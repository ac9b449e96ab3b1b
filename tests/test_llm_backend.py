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
    # extraction -> probe YES -> continuation -> probe NO (loop caps anyway)
    client, calls = make_client([rec1, "YES", rec2])
    extractor = LLMExtractor(client, max_gleaning=1)
    chunks = spark.createDataFrame(
        [("c1", "d1", "some text")], ["chunk_id", "doc_id", "content"]
    )
    from mmgraphrag_spark.operators.extract import extract_mentions, parse_mentions

    mentions = extract_mentions(chunks, backend=extractor)
    ents, _ = parse_mentions(mentions)
    names = {r.entity_name for r in ents.collect()}
    assert names == {'"A"', '"B"'}  # both rounds parsed from one wire string


def test_no_gleaning_when_probe_says_no(spark):
    rec1 = '("entity"<|>"A"<|>"PERSON"<|>only)<|COMPLETE|>'
    client, calls = make_client([rec1, "NO"])
    extractor = LLMExtractor(client, max_gleaning=1)
    chunks = spark.createDataFrame(
        [("c1", "d1", "t")], ["chunk_id", "doc_id", "content"]
    )
    from mmgraphrag_spark.operators.extract import extract_mentions

    out = extract_mentions(chunks, backend=extractor).first()
    assert "only" in out.records and "##" not in out.records.replace(rec1, "")
