"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure JVM column expressions (WholeStageCodegen; no UDFs) and each is
mirrorable 1:1 in ANSI SQL for the DuckDB oracle — the marker-word lists and
weights below are the single source of truth (keep in sync with
__spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mmgraphrag_spark.functions import bpe_ish_token_count, whitespace_token_count
from mmgraphrag_spark.operators.dedup import word_shingles, word_tokens

# marker stopwords per language (tiny n-gram/stopword-heuristic profiles)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una", "con", "por"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "sur"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
}
CJK_RANGE = r"[一-鿿]"


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(F.array_distinct(tokens), marker_arr))


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang, score): argmax of marker-stopword hits; CJK-char ratio
    short-circuits to 'zh'. Ties broken by language code ascending
    (deterministic; same rule in the SQL oracle)."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z一-鿿 ]", " ")), r" +")
    cjk = F.size(F.regexp_extract_all(F.col(text_col), F.lit(CJK_RANGE), 0))
    scored = F.array(
        *[
            F.struct(
                (-_marker_hits(toks, m)).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang, m in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_min(scored)
    return df.select(
        F.col(id_col).alias("id"),
        F.when(cjk * 2 >= whitespace_token_count(F.col(text_col)), F.lit("zh"))
        .when(-best.getField("neg") == 0, F.lit("und"))
        .otherwise(best.getField("lang"))
        .alias("lang"),
        F.greatest(-best.getField("neg"), cjk).cast("int").alias("score"),
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    quality): cheap heuristics a pretraining filter would gate on."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = whitespace_token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    # lowercase BEFORE stripping non-[a-z0-9 ] (the former strip-then-lower
    # order deleted uppercase letters entirely, silently diverging from the
    # DuckDB oracle's _TOKS on any mixed-case text); reuse the one shared
    # tokenization so Spark and oracle can never drift again
    toks = word_tokens(t)
    en = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    mean_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus separators
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    quality = (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 3) & (mean_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 2).alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, bpe_tokens): whitespace + BPE-ish regex token counts."""
    return df.select(
        F.col(id_col).alias("id"),
        whitespace_token_count(F.col(text_col)).alias("ws_tokens"),
        bpe_ish_token_count(F.col(text_col)).alias("bpe_tokens"),
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, shingle_len: int = 5
) -> DataFrame:
    """(id, fingerprint): winnowing-style document fingerprint = lexicographic
    min of md5 over word shingles (one stable representative hash per doc;
    rolling-hash analogue, order-insensitive like the reference's md5 ids)."""
    sh = word_shingles(F.col(text_col), shingle_len)
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("fingerprint"),
    )


def link_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_urls, n_emails, url_char_ratio): link/contact density features —
    standard training-data quality signals (boilerplate and spam pages are
    link-dense). Pure JVM regex (RE2-compatible patterns, reproducible in the
    SQL oracle); zero shuffles."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(r"https?://[^\s]+"), 0)
    emails = F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"),
        0,
    )
    # total url chars WITHOUT interpreted array lambdas (CLAUDE.md rule 4):
    # join-then-length is codegen'd and equals the per-element length sum
    url_chars = F.length(F.array_join(urls, ""))
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(urls).alias("n_urls"),
        F.size(emails).alias("n_emails"),
        F.round(url_chars / n_chars, 4).alias("url_char_ratio"),
    )
