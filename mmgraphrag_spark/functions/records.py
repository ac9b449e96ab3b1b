"""Record-grammar parsing as DataFrame expressions (SURVEY.md §1.2, §2.2 P3-P6).

The extraction wire format (reference prompt.py:190-192):
    records separated by "##" or terminated by "<|COMPLETE|>"; fields by "<|>";
    each record wrapped in parentheses. Entity records have >=4 fields with
    field0 == '"entity"'; relationship records >=5 fields with '"relationship"'.

Everything here is JVM-side (regexp_extract_all / split / filter / try_cast):
parsing stays inside WholeStageCodegen even when the upstream extractor is a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# field-split pattern: the literal "<|>" marker (text2graph.py:386-395; base.py:66-71)
_FIELD_PAT = r"<\|>"

def explode_records(df: DataFrame, records_col: str = "records") -> DataFrame:
    """records string -> one row per record with an ``attrs`` array<string> column.

    Reference-exact order (text2graph.py:371-395): FIRST split the wire
    string on "##" / "<|COMPLETE|>", THEN take each record's outer-paren
    group with the reference's greedy ``\\((.*)\\)`` — greedy first-( to
    last-), so parentheses INSIDE fields survive ("John Smith (born 1970)").
    A former single-pass ``\\(([^()]*)\\)`` extraction silently dropped any
    record containing inner parens. Pieces without a paren group are skipped,
    like the reference's None-match continue. All native expressions — no
    interpreted array lambdas in this (hot) parse path.
    """
    out = df.withColumn(
        "_rec0", F.explode(F.split(F.col(records_col), r"##|<\|COMPLETE\|>"))
    )
    out = (
        out.withColumn("_rec", F.regexp_extract(F.col("_rec0"), r"\((.*)\)", 1))
        .filter(F.col("_rec") != "")
        .drop("_rec0")
    )
    attrs = F.transform(F.split(F.col("_rec"), _FIELD_PAT), lambda x: F.trim(x))
    return out.withColumn("attrs", attrs).drop("_rec")

def _unquote(c: Column) -> Column:
    return F.regexp_replace(c, r'^"|"$', "")

def parse_entity_records(df: DataFrame) -> DataFrame:
    """Filter+project entity records (text2graph.py:56-71).

    Keeps rows with size(attrs)>=4 and attrs[0]=='"entity"'; projects
    upper-cased quoted name, upper-cased type, description.
    """
    e = df.filter((F.size("attrs") >= 4) & (F.element_at("attrs", 1) == '"entity"'))
    return e.select(
        *[c for c in df.columns if c != "attrs"],
        F.upper(F.element_at("attrs", 2)).alias("entity_name"),
        F.upper(F.element_at("attrs", 3)).alias("entity_type"),
        _unquote(F.element_at("attrs", 4)).alias("description"),
    )

def parse_relationship_records(df: DataFrame) -> DataFrame:
    """Filter+project relationship records (text2graph.py:118-138).

    weight = trailing field parsed as double when float-like else 1.0
    (is_float_regex, base.py:138-139); endpoints upper-cased; undirected key
    canonicalized src<=tgt (text2graph.py:442-443).
    """
    r = df.filter((F.size("attrs") >= 5) & (F.element_at("attrs", 1) == '"relationship"'))
    a = F.upper(F.element_at("attrs", 2))
    b = F.upper(F.element_at("attrs", 3))
    w = F.coalesce(_unquote(F.element_at("attrs", -1)).try_cast("double"), F.lit(1.0))
    return r.select(
        *[c for c in df.columns if c != "attrs"],
        F.least(a, b).alias("src"),
        F.greatest(a, b).alias("tgt"),
        _unquote(F.element_at("attrs", 4)).alias("description"),
        w.alias("weight"),
    )
