"""Unit tests for the column-expression library (SURVEY.md §2.2 P1-P11)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mmgraphrag_spark.functions import (
    bpe_ish_token_count,
    clean_str_col,
    mdhash_id,
    normalize_name,
    ensure_quoted,
    whitespace_token_count,
)
from mmgraphrag_spark.functions.records import (
    explode_records,
    parse_entity_records,
    parse_relationship_records,
)


def test_clean_str(spark):
    df = spark.createDataFrame(
        [("  a&amp;b\x00c  ",), ("x&lt;y&gt;z",)], ["s"]
    ).select(clean_str_col(F.col("s")).alias("c"))
    assert [r.c for r in df.collect()] == ["a&bc", "x<y>z"]


def test_mdhash_id(spark):
    content = "hello world"
    expected = "chunk-" + hashlib.md5(content.encode()).hexdigest()
    got = (
        spark.createDataFrame([(content,)], ["s"])
        .select(mdhash_id(F.col("s"), "chunk-").alias("h"))
        .first()
        .h
    )
    assert got == expected


def test_record_grammar_roundtrip(spark):
    records = (
        '("entity"<|>"APPLE"<|>"ORGANIZATION"<|>a fruit company)##'
        '("entity"<|>"BANANA"<|>"FOOD"<|>yellow)##'
        '("relationship"<|>"APPLE"<|>"BANANA"<|>both edible<|>7)##'
        '("relationship"<|>"ZED"<|>"APPLE"<|>unweighted<|>notafloat)<|COMPLETE|>'
    )
    df = spark.createDataFrame([("c1", records)], ["chunk_id", "records"])
    recs = explode_records(df, "records")
    ents = parse_entity_records(recs).collect()
    rels = parse_relationship_records(recs).orderBy("src").collect()
    assert {(e.entity_name, e.entity_type, e.description) for e in ents} == {
        ('"APPLE"', '"ORGANIZATION"', "a fruit company"),
        ('"BANANA"', '"FOOD"', "yellow"),
    }
    # weight parse w/ default 1.0 (base.py:138-139); src<=tgt canonical order
    assert [(r.src, r.tgt, r.weight) for r in rels] == [
        ('"APPLE"', '"BANANA"', 7.0),
        ('"APPLE"', '"ZED"', 1.0),
    ]


def test_malformed_records_dropped(spark):
    records = '("entity"<|>"X")##(junk)##("relationship"<|>"A"<|>"B")<|COMPLETE|>'
    df = spark.createDataFrame([("c1", records)], ["chunk_id", "records"])
    recs = explode_records(df, "records")
    assert parse_entity_records(recs).count() == 0  # <4 fields
    assert parse_relationship_records(recs).count() == 0  # <5 fields


def test_normalize_and_quote(spark):
    df = spark.createDataFrame([('"Foo Bar"',), ("baz",)], ["s"])
    got = df.select(
        normalize_name(F.col("s")).alias("n"), ensure_quoted(F.col("s")).alias("q")
    ).collect()
    assert (got[0].n, got[0].q) == ("foobar", '"Foo Bar"')
    assert (got[1].n, got[1].q) == ("baz", '"baz"')


def test_token_counts(spark):
    df = spark.createDataFrame([("one two  three",)], ["s"])
    r = df.select(
        whitespace_token_count(F.col("s")).alias("w"),
        bpe_ish_token_count(F.col("s")).alias("b"),
    ).first()
    assert r.w == 3
    assert r.b == 3


def test_records_with_inner_parentheses_survive(spark):
    """Reference parses each ##-split record with a GREEDY paren regex, so
    parentheses INSIDE fields survive — a record like 'John Smith (born
    1970)' must not be dropped (the old single-pass [^()]* extraction lost
    it entirely)."""
    from mmgraphrag_spark.functions.records import (
        explode_records,
        parse_entity_records,
        parse_relationship_records,
    )

    wire = (
        '("entity"<|>"JOHN SMITH"<|>"PERSON"<|>John Smith (born 1970) teaches)##'
        '("relationship"<|>"JOHN SMITH"<|>"MIT"<|>works (since 2001) at<|>3)'
        "<|COMPLETE|>"
    )
    df = spark.createDataFrame([("c1", wire)], ["chunk_id", "records"])
    recs = explode_records(df)
    ents = parse_entity_records(recs).collect()
    rels = parse_relationship_records(recs).collect()
    assert len(ents) == 1
    assert ents[0].description == "John Smith (born 1970) teaches"
    assert len(rels) == 1
    assert rels[0].description == "works (since 2001) at"
    assert rels[0].weight == 3.0
