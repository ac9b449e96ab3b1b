"""Text-analysis tests: language ID, quality, token counts, fingerprint."""

from __future__ import annotations

from mmgraphrag_spark.operators import textstats as TS


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and the dog is with that"),
            (2, "el perro y la casa de los gatos con una mesa por ahi"),
            (3, "这是 一个 中文 句子 关于 猫"),
            (4, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    got = {r.id: r.lang for r in TS.language_id(df, "doc_id", "text").collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "zh"
    assert got[4] == "und"


def test_quality_features(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "!!! ??? ... ###"),
        ],
        ["doc_id", "text"],
    )
    got = {r.id: r for r in TS.quality_features(df, "doc_id", "text").collect()}
    assert got[1].quality > got[2].quality
    assert got[2].punct_ratio > 0.5
    assert got[1].stopword_ratio > 0.1


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello, world! it's 42")], ["doc_id", "text"])
    r = TS.token_counts(df, "doc_id", "text").first()
    assert r.ws_tokens == 4
    # hello , world ! it ' s 42  -> 8
    assert r.bpe_tokens == 8


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "x y z w v u t s")],
        ["doc_id", "text"],
    )
    got = {r.id: r.fingerprint for r in TS.fingerprint(df, "doc_id", "text").collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_link_stats(spark):
    rows = [
        (1, "plain text with no links at all"),
        (2, "go to https://a.example/x and http://b.example/y?z=1 or write me@host.org"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from mmgraphrag_spark.operators.textstats import link_stats

    out = {r.id: (r.n_urls, r.n_emails, r.url_char_ratio)
           for r in link_stats(df, "doc_id", "text").collect()}
    assert out[1] == (0, 0, 0.0)
    n_urls, n_emails, ratio = out[2]
    assert n_urls == 2 and n_emails == 1 and 0 < ratio < 1
