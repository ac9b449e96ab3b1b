"""Property-based tests (hypothesis): chunk-window coverage, record-grammar
round-trip, merge order-insensitivity. Example counts kept small — each
example is a Spark job."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mmgraphrag_spark import FIELD_SEP, RECORD_SEP, COMPLETE_TAG, schema
from mmgraphrag_spark.functions.records import (
    explode_records,
    parse_entity_records,
    parse_relationship_records,
)
from mmgraphrag_spark.operators import merge as M
from mmgraphrag_spark.operators import spans as S

_settings = settings(max_examples=5, deadline=None)

name_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Nd")), min_size=1, max_size=8
)
word_st = st.text(alphabet="abcdefghij", min_size=1, max_size=5)


@given(
    n_tokens=st.integers(min_value=1, max_value=200),
    max_tokens=st.integers(min_value=2, max_value=40),
    overlap=st.integers(min_value=0, max_value=1),
)
@_settings
def test_chunk_windows_cover_all_tokens(spark, n_tokens, max_tokens, overlap):
    """Every token appears in some window; window sizes <= max_tokens; the
    union of step-strided windows reconstructs the text."""
    overlap = min(overlap, max_tokens - 1)
    text = " ".join(f"w{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([("d", [("text", text, "", 0)])], schema.DOCUMENTS)
    chunks = S.chunk_text_spans(
        S.explode_spans(docs), max_tokens=max_tokens, overlap=overlap
    ).collect()
    seen = set()
    for c in chunks:
        toks = c.content.split()
        assert len(toks) <= max_tokens
        assert c.tokens == len(toks)
        seen.update(toks)
    assert seen == {f"w{i}" for i in range(n_tokens)}


@given(
    ents=st.lists(
        st.tuples(name_st, name_st, st.lists(word_st, min_size=1, max_size=4)),
        min_size=1, max_size=4, unique_by=lambda t: t[0],
    )
)
@_settings
def test_record_grammar_roundtrip_property(spark, ents):
    recs = [
        f'("entity"{FIELD_SEP}"{n}"{FIELD_SEP}"{t}"{FIELD_SEP}{" ".join(d)})'
        for n, t, d in ents
    ]
    payload = RECORD_SEP.join(recs) + COMPLETE_TAG
    df = spark.createDataFrame([("c", payload)], ["chunk_id", "records"])
    got = {
        (r.entity_name, r.entity_type, r.description)
        for r in parse_entity_records(explode_records(df)).collect()
    }
    exp = {(f'"{n.upper()}"', f'"{t.upper()}"', " ".join(d)) for n, t, d in ents}
    assert got == exp


@given(
    mentions=st.lists(
        st.tuples(
            st.sampled_from(['"A"', '"B"']),
            st.sampled_from(['"T1"', '"T2"', '"T3"']),
            word_st,
            st.sampled_from(["c1", "c2", "c3"]),
        ),
        min_size=1, max_size=8,
    ),
    seed=st.integers(min_value=0, max_value=100),
)
@_settings
def test_entity_merge_order_insensitive(spark, mentions, seed):
    import random

    cols = ["entity_name", "entity_type", "description", "source_id"]
    a = M.merge_entities(spark.createDataFrame(mentions, cols)).collect()
    shuffled = list(mentions)
    random.Random(seed).shuffle(shuffled)
    b = M.merge_entities(spark.createDataFrame(shuffled, cols)).collect()
    key = lambda rows: sorted(
        (r.entity_name, r.entity_type, r.description, tuple(sorted(r.source_ids)))
        for r in rows
    )
    assert key(a) == key(b)


@given(st.text(max_size=300))
@_settings
def test_regex_tokenizer_roundtrip_property(text):
    """P9 invariant: decode(encode(x)) == x for ANY text — every character
    belongs to exactly one token (whitespace rides as prefixes)."""
    from mmgraphrag_spark.backends.tokenizer import RegexTokenizerBackend

    t = RegexTokenizerBackend()
    assert t.decode(t.encode(text)) == text


@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["entity_name", "entity_type", "description"]),
            st.text(max_size=30),
            min_size=1,
            max_size=3,
        ),
        max_size=5,
    ),
    st.text(max_size=40),
    st.text(max_size=40),
)
@_settings
def test_salvage_json_list_recovers_valid_lists(items, prefix, suffix):
    """P16 invariant: a VALID JSON list embedded in arbitrary noise is
    recovered intact (strict pass), for any dict contents incl. quotes."""
    import json

    from mmgraphrag_spark.backends.llm import salvage_json_list

    noise_prefix = prefix.replace("[", "(").replace("]", ")")
    payload = json.dumps(items)
    assert salvage_json_list(noise_prefix + payload + suffix) == items
