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


class FasttextLangIdBackend:
    """Production language-ID backend seam (mirrors YoloMllmBackend /
    SentenceTransformerBackend gating): a fastText lid.176 model scoring
    Arrow batches of text. The library and the .bin weights are unavailable
    in this sandbox, so construction raises with the recipe; the marker
    heuristic (:func:`language_id`) stays the offline default AND the exact
    oracle. The Spark plumbing is identical either way: mapInPandas over
    (id, text) batches emitting (id, lang, score), partitions pinned by the
    caller like every python stage (CLAUDE.md rule 3)."""

    def __init__(self, model_path: str = "lid.176.bin"):
        try:
            import fasttext  # gated import: not in this container
        except ImportError as e:
            raise NotImplementedError(
                "FasttextLangIdBackend needs the fasttext package and the "
                "lid.176.bin weights (https://fasttext.cc/docs/en/"
                "language-identification.html); use language_id's marker "
                "heuristic offline"
            ) from e
        self._model_path = model_path
        self._model = fasttext.load_model(model_path)

    def __getstate__(self):
        # model weights never ride the closure; rebuilt per python worker
        return {"model_path": self._model_path}

    def __setstate__(self, state):
        self.__init__(state["model_path"])

    def map_batches(self, it):
        for pdf in it:
            labels, probs = self._model.predict(
                [t.replace("\n", " ") for t in pdf["text"].tolist()]
            )
            pdf = pdf[["id"]].copy()
            pdf["lang"] = [l[0].removeprefix("__label__") for l in labels]
            pdf["score"] = [float(p[0]) for p in probs]
            yield pdf


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


# unit-kind prefixes for repetition_features: one char per n-gram order so a
# single explode carries every kind and ulen = len(u) - 1 stays uniform
_TOP_GRAM_KINDS = [("2", 2), ("3", 3), ("4", 4)]
_DUP_GRAM_KINDS = [("5", 5), ("6", 6), ("7", 7), ("8", 8), ("9", 9), ("x", 10)]


def repetition_features(
    df: DataFrame, id_col: str, text_col: str, num_partitions: int | None = None
) -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_line_char_frac, top_bigram_char_frac,
    top_3gram_char_frac, top_4gram_char_frac, dup_{5..10}gram_char_frac):
    the full Gopher/MassiveText repetition gate (Rae et al. 2021, Table A1):
    duplicate-line fractions, top n-gram char fractions for n=2..4, and
    duplicate n-gram char fractions for n=5..10.

    Definitions (mirrored exactly by the DuckDB oracle):
      - lines: '\\n'-split, trimmed, empties dropped.
      - dup_line_frac       = 1 - distinct_lines / n_lines.
      - dup_line_char_frac  = chars in lines occurring >1 time (ALL their
                              occurrences) / total line chars.
      - top_{n}gram_char_frac = occurrences(top word-ngram) * len(top ngram)
                              / len(normalized text); the top n-gram is the
                              max by (count, gram) so ties are deterministic.
        Word n-grams are OVERLAPPING and non-distinct, over word_tokens'
        normalization — overlapping occurrences re-count shared characters,
        so the value may exceed 1 on pathologically repetitive docs
        (uncapped by design; filters threshold well below 1).
      - dup_{n}gram_char_frac = sum over n-grams occurring >1 time of
                              occurrences * len(gram) / len(normalized
                              text), capped at 1.0 (the Gopher convention:
                              it is read as "fraction of characters inside
                              duplicated n-grams", and the overlap
                              re-counting would otherwise push it past 1).

    Scale shape: ONE explicit repartition by id, then one explode of
    kind-prefixed units ('l' + line / '2'..'9','x' + n-gram) ->
    groupBy(id, unit) -> groupBy(id) — both aggregations' required
    distributions are satisfied by the id partitioning, so the whole
    operator plans exactly one Exchange and zero joins (asserted in
    test_textstats); growing from 1 to 9 gram orders only widened the unit
    union, not the plan. explode_outer keeps docs with no nonempty line and
    <2 tokens (they get 0.0 fractions). Keys are per-document —
    near-uniform; partial aggregation shrinks the explode output before
    anything wide. A pathological single doc with millions of lines lands
    in one partition, inherent to per-document statistics."""
    idc = F.col(id_col)
    t = F.col(text_col)
    npart = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    lines = F.filter(
        F.transform(F.split(t, r"\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    # overlapping word n-grams via one regex pass per order (CLAUDE.md rule 4:
    # no per-index interpreted array slices); the ONE shared normalization
    from mmgraphrag_spark.operators.dedup import norm_text

    norm = norm_text(t)

    def grams(n: int):
        pat = r"\b(?=((?:[a-z0-9]+ ){%d}[a-z0-9]+))" % (n - 1)
        return F.regexp_extract_all(norm, F.lit(pat), 1)

    def tagged(arr, p: str):
        # NOTE: a two-parameter lambda (e.g. `lambda g, p=pfx`) would make
        # F.transform pass the ELEMENT INDEX as the second argument,
        # silently clobbering the prefix — hence this single-arg closure
        return F.transform(arr, lambda g: F.concat(F.lit(p), g))

    units = F.concat(
        tagged(lines, "l"),
        *[tagged(grams(n), pfx) for pfx, n in _TOP_GRAM_KINDS + _DUP_GRAM_KINDS],
    )

    base = df.repartition(npart, idc).select(
        idc.alias("id"),
        F.length(norm).alias("n_chars_norm"),
        F.explode_outer(units).alias("u"),
    )
    kind = F.substring(F.col("u"), 1, 1)
    ulen = F.length(F.col("u")) - 1  # content length without the kind prefix
    is_l = kind == "l"
    per_unit = base.groupBy("id", "u").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("n_chars_norm").alias("ncn")
    )
    cnt = F.col("cnt")
    per_doc = per_unit.groupBy("id").agg(
        F.sum(F.when(is_l, cnt).otherwise(0)).alias("n_lines"),
        F.sum(F.when(is_l, F.lit(1)).otherwise(0)).alias("n_distinct_lines"),
        F.sum(F.when(is_l & (cnt > 1), cnt * ulen).otherwise(0)).alias("dup_chars"),
        F.sum(F.when(is_l, cnt * ulen).otherwise(0)).alias("tot_chars"),
        # argmax n-gram by (count, gram): max over a struct; nulls (lines,
        # other kinds, empty docs) are ignored by max
        *[
            F.max(F.when(kind == pfx, F.struct(cnt, F.col("u")))).alias(f"top{n}")
            for pfx, n in _TOP_GRAM_KINDS
        ],
        *[
            F.sum(F.when((kind == pfx) & (cnt > 1), cnt * ulen).otherwise(0)).alias(
                f"dupg{n}"
            )
            for pfx, n in _DUP_GRAM_KINDS
        ],
        F.first("ncn").alias("ncn"),
    )
    ncn = F.greatest(F.col("ncn"), F.lit(1))

    def top_frac(n: int):
        top = F.col(f"top{n}")
        raw = top.getField("cnt") * (F.length(top.getField("u")) - 1) / ncn
        return F.round(F.coalesce(raw, F.lit(0.0)), 4)

    def dup_frac(n: int):
        return F.round(F.least(F.lit(1.0), F.col(f"dupg{n}") / ncn), 4)

    return per_doc.select(
        "id",
        F.col("n_lines").cast("int").alias("n_lines"),
        F.round(
            F.when(
                F.col("n_lines") > 0,
                1 - F.col("n_distinct_lines") / F.col("n_lines"),
            ).otherwise(0.0),
            4,
        ).alias("dup_line_frac"),
        F.round(F.col("dup_chars") / F.greatest(F.col("tot_chars"), F.lit(1)), 4).alias(
            "dup_line_char_frac"
        ),
        top_frac(2).alias("top_bigram_char_frac"),
        top_frac(3).alias("top_3gram_char_frac"),
        top_frac(4).alias("top_4gram_char_frac"),
        *[dup_frac(n).alias(f"dup_{n}gram_char_frac") for _, n in _DUP_GRAM_KINDS],
    )


# PII patterns: RE2-compatible (no lookaround/backrefs) so the DuckDB oracle
# runs the IDENTICAL strings; Java and RE2 agree on these constructs
# (greedy quantifiers without backrefs match identically). Keep in sync with
# __spark_entry__.oracle_sql()["pii_scrub"].
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, clean_text, n_emails, n_ips, n_phones): redact emails -> [EMAIL],
    IPv4s -> [IP], phone-ish digit runs -> [PHONE], counting each on the text
    AS OF its scrub stage (emails first, so a count never double-reports the
    digits inside an already-redacted token). Pure JVM regexp expressions:
    WholeStageCodegen, zero shuffles, zero UDFs — the shape a 100 TB scrub
    pass needs (one scan, one write)."""
    t0 = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(PII_EMAIL), 0))
    t1 = F.regexp_replace(t0, PII_EMAIL, "[EMAIL]")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IP), 0))
    t2 = F.regexp_replace(t1, PII_IP, "[IP]")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE), 0))
    t3 = F.regexp_replace(t2, PII_PHONE, "[PHONE]")
    return df.select(
        F.col(id_col).alias("id"),
        t3.alias("clean_text"),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
    )


def link_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_urls, n_emails, url_char_ratio): link/contact density features —
    standard training-data quality signals (boilerplate and spam pages are
    link-dense). Pure JVM regex (RE2-compatible patterns, reproducible in the
    SQL oracle); zero shuffles."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(r"https?://[^\s]+"), 0)
    # the email definition is PII_EMAIL — link density and PII redaction must
    # never disagree on what an email is
    emails = F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL), 0)
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
