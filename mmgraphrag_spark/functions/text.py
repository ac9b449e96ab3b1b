"""Scalar text/id column expressions (SURVEY.md §2.2).

All JVM-side built-ins — these run inside WholeStageCodegen; no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

def clean_str_col(col: Column) -> Column:
    """HTML-unescape (common entities) + strip + drop control chars.

    Reference: base.py:54-63 (html.unescape + strip + ``[\\x00-\\x1f\\x7f-\\x9f]``).
    The five predefined XML entities cover the reference's observed inputs; full
    HTML unescape would need a UDF and is deliberately avoided on the hot path.
    """
    c = F.trim(col)
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.regexp_replace(c, r"[\x00-\x1f\x7f-\x9f]", "")

def mdhash_id(col: Column, prefix: str = "") -> Column:
    """``prefix + md5(content)`` — reference compute_mdhash_id (base.py:105-106)."""
    return F.concat(F.lit(prefix), F.md5(col))

def args_hash(*cols: Column) -> Column:
    """LLM-cache key: md5 over the serialized args (base.py:100-101)."""
    return F.md5(F.to_json(F.struct(*cols)))

def split_by_markers(col: Column, markers: list[str]) -> Column:
    """Split on an alternation of literal markers, drop empties (base.py:66-71)."""
    pat = "|".join(re.escape(m) for m in markers)
    return F.filter(F.split(col, pat), lambda x: F.trim(x) != "")

def normalize_name(col: Column) -> Column:
    """Matching normalization: strip quotes/spaces/backslashes, lowercase.

    Reference: fusion.py:772-784.
    """
    return F.lower(F.regexp_replace(col, r'[ \\"]', ""))

def ensure_quoted(col: Column) -> Column:
    """Wrap in double quotes when absent (fusion.py:598-603)."""
    quoted = col.startswith('"') & col.endswith('"')
    return F.when(quoted, col).otherwise(F.concat(F.lit('"'), col, F.lit('"')))

def whitespace_token_count(col: Column) -> Column:
    """Token count by whitespace split (deterministic test-mode tokenizer, SURVEY P9)."""
    return F.size(F.split(F.trim(col), r"\s+"))

def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: words + digits + punctuation runs as separate tokens."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"), 0))
