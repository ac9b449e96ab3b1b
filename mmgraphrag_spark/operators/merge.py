"""Entity/edge merge aggregations (SURVEY.md §2.5 A1-A3, §2.4 J5/J6/J7).

Reference semantics, re-expressed as partial-aggregable built-in Spark aggs:
  A1 node merge (text2graph.py:140-208): type = mode of observed types,
     description = <SEP>-join of sorted set, source_ids = set union.
  A2 edge merge (text2graph.py:210-279): weight = sum, order = min,
     desc/source_ids as A1; undirected key src<=tgt (text2graph.py:442-443).
  J5 dangling endpoints inserted as '"UNKNOWN"' nodes (text2graph.py:258-268).
  A3 conditional long-description summarization (text2graph.py:73-116).

Deviation (documented): reference Counter.most_common breaks mode ties by
insertion order; we break ties deterministically by (count desc, type asc).

Scale notes: both merges are single hash-shuffles on their group key with
map-side partial aggregation (collect_set/sum/min all combine). Hub entities
make A1/A2 keys skewed — the groupBy itself is fine (partial aggs absorb the
hot key map-side); the later fusion join is where skew salting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmgraphrag_spark import GRAPH_FIELD_SEP

def merge_entities(ent_mentions: DataFrame) -> DataFrame:
    """(entity_name, entity_type, description, source_id) -> schema.ENTITIES.

    Two-stage agg: groupBy(name, type) counts + partial sets, then groupBy(name)
    picks the modal type via min(struct(-count, type)) and unions the sets —
    all built-in, no UDAF.
    """
    per_type = ent_mentions.groupBy("entity_name", "entity_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.collect_set("description").alias("descs"),
        F.collect_set("source_id").alias("srcs"),
    )
    return (
        per_type.groupBy("entity_name")
        .agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("entity_type").alias("t")))
            .getField("t")
            .alias("entity_type"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("descs")))).alias("_d"),
            F.array_distinct(F.flatten(F.collect_list("srcs"))).alias("source_ids"),
        )
        .withColumn("description", F.concat_ws(GRAPH_FIELD_SEP, "_d"))
        .select("entity_name", "entity_type", "description", "source_ids")
    )

def merge_edges(rel_mentions: DataFrame) -> DataFrame:
    """(src, tgt, description, weight, source_id[, order]) -> schema.EDGES."""
    src = F.least("src", "tgt")
    tgt = F.greatest("src", "tgt")
    base = rel_mentions.withColumn("_s", src).withColumn("_t", tgt)
    order_col = F.col("order") if "order" in rel_mentions.columns else F.lit(1)
    return (
        base.withColumn("_o", order_col)
        .groupBy(F.col("_s").alias("src"), F.col("_t").alias("tgt"))
        .agg(
            F.sum("weight").alias("weight"),
            F.concat_ws(
                GRAPH_FIELD_SEP, F.array_sort(F.collect_set("description"))
            ).alias("description"),
            F.collect_set("source_id").alias("source_ids"),
            F.min("_o").alias("order"),
        )
        .select("src", "tgt", "weight", "description", "source_ids", "order")
    )

def add_dangling_entities(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """J5: endpoints that are not nodes become '"UNKNOWN"'-typed entities."""
    endpoints = (
        edges.select(F.col("src").alias("entity_name"))
        .unionByName(edges.select(F.col("tgt").alias("entity_name")))
        .distinct()
    )
    missing = endpoints.join(entities.select("entity_name"), "entity_name", "left_anti")
    dangling = missing.select(
        "entity_name",
        F.lit('"UNKNOWN"').alias("entity_type"),
        F.col("entity_name").alias("description"),
        F.array().cast("array<string>").alias("source_ids"),
    )
    return entities.unionByName(dangling)

def summarize_long_descriptions(
    entities: DataFrame,
    max_tokens: int = 500,
    keep_tokens: int = 120,
    backend=None,
) -> DataFrame:
    """A3: descriptions over the token threshold get summarized.

    ``backend=None`` (offline default): deterministic truncation summarizer
    (first keep_tokens tokens + ellipsis marker), pure JVM slice/concat.

    ``backend`` set (e.g. ``backends.llm.LLMSummarizer``): the reference shape
    (text2graph.py:73-116, threshold 500) — ONLY the rows over the threshold
    go through a batched Arrow UDF calling ``backend.summarize(entity_name,
    description)``, then join back onto the untouched majority. Short
    descriptions never leave the JVM, so the LLM path costs exactly one
    python stage over the (rare) long tail.
    """
    toks = F.split(F.col("description"), r"\s+")
    needs = F.size(toks) >= max_tokens
    if backend is None:
        summarized = F.concat_ws(" ", F.slice(toks, 1, keep_tokens))
        return entities.withColumn(
            "description",
            F.when(needs, F.concat(summarized, F.lit(" ..."))).otherwise(
                F.col("description")
            ),
        )

    long_rows = entities.filter(needs).select("entity_name", "description")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "entity_name": pdf["entity_name"],
                    "_summary": [
                        backend.summarize(n, d)
                        for n, d in zip(pdf["entity_name"], pdf["description"])
                    ],
                }
            )

    n_parts = entities.sparkSession.sparkContext.defaultParallelism
    summaries = long_rows.repartition(n_parts, "entity_name").mapInPandas(
        run, "entity_name string, _summary string"
    )
    return (
        entities.join(summaries, "entity_name", "left")
        .withColumn("description", F.coalesce(F.col("_summary"), F.col("description")))
        .drop("_summary")
    )

def triples_view(edges: DataFrame) -> DataFrame:
    """Edges -> (subj, pred, obj, weight) triples (SURVEY §1: the scored unit)."""
    return edges.select(
        F.col("src").alias("subj"),
        F.col("description").alias("pred"),
        F.col("tgt").alias("obj"),
        F.col("weight").alias("weight"),
    )
