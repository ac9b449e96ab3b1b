"""GraphML export sink — parity with the reference's persisted graph format
(storage.py:331-342 write, 363-402 deterministic stabilization W8).

The reference's unit of persistence is one GraphML XML file per graph. XML is
inherently a single-file, driver-side artifact; this exporter collects with an
explicit row cap (default 1M) and is meant for per-document or per-image
subgraphs and parity checks — the SCALE path is the parquet/Iceberg
entities/edges tables, not this sink.

Deterministic ordering reproduced from the reference: nodes sorted by id,
edges canonicalized src<=tgt and sorted by "src -> tgt" key.
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmgraphrag_spark import GRAPH_FIELD_SEP

_HEADER = (
    '<?xml version="1.0" encoding="utf-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    '  <key id="d0" for="node" attr.name="entity_type" attr.type="string"/>\n'
    '  <key id="d1" for="node" attr.name="description" attr.type="string"/>\n'
    '  <key id="d2" for="node" attr.name="source_id" attr.type="string"/>\n'
    '  <key id="d3" for="edge" attr.name="weight" attr.type="double"/>\n'
    '  <key id="d4" for="edge" attr.name="description" attr.type="string"/>\n'
    '  <key id="d5" for="edge" attr.name="source_id" attr.type="string"/>\n'
    '  <key id="d6" for="edge" attr.name="order" attr.type="long"/>\n'
    '  <graph edgedefault="undirected">\n'
)


def export_graphml(
    entities: DataFrame, edges: DataFrame, path: str, max_rows: int = 1_000_000
) -> None:
    """Write entities/edges as a reference-compatible GraphML file."""
    n = entities.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"graph too large for single-file GraphML export (> {max_rows} "
            "nodes); use the parquet/Iceberg tables instead"
        )
    ne = edges.limit(max_rows + 1).count()
    if ne > max_rows:
        raise ValueError(
            f"graph too large for single-file GraphML export (> {max_rows} "
            "edges); use the parquet/Iceberg tables instead"
        )
    node_rows = (
        entities.select(
            "entity_name", "entity_type", "description",
            F.concat_ws(GRAPH_FIELD_SEP, F.array_sort("source_ids")).alias("source_id"),
        )
        .orderBy("entity_name")
        .collect()
    )
    edge_rows = (
        edges.select(
            F.least("src", "tgt").alias("src"),
            F.greatest("src", "tgt").alias("tgt"),
            "weight", "description",
            F.concat_ws(GRAPH_FIELD_SEP, F.array_sort("source_ids")).alias("source_id"),
            "order",
        )
        .orderBy(F.concat_ws(" -> ", "src", "tgt"))
        .collect()
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(_HEADER)
        for r in node_rows:
            f.write(f'    <node id={quoteattr(r.entity_name)}>\n')
            f.write(f'      <data key="d0">{escape(r.entity_type)}</data>\n')
            f.write(f'      <data key="d1">{escape(r.description)}</data>\n')
            f.write(f'      <data key="d2">{escape(r.source_id)}</data>\n')
            f.write("    </node>\n")
        for r in edge_rows:
            f.write(
                f'    <edge source={quoteattr(r.src)} target={quoteattr(r.tgt)}>\n'
            )
            f.write(f'      <data key="d3">{r.weight}</data>\n')
            f.write(f'      <data key="d4">{escape(r.description)}</data>\n')
            f.write(f'      <data key="d5">{escape(r.source_id)}</data>\n')
            f.write(f'      <data key="d6">{r["order"]}</data>\n')
            f.write("    </edge>\n")
        f.write("  </graph>\n</graphml>\n")


def read_graphml(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse a GraphML file (ours or the reference's) back into entity/edge
    DataFrames — the S5 read side, used for parity diffing."""
    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()
    keys = {
        k.get("id"): k.get("attr.name") for k in root.findall("g:key", ns)
    }
    nodes, edges = [], []
    graph = root.find("g:graph", ns)
    for el in graph.findall("g:node", ns):
        attrs = {keys[d.get("key")]: d.text or "" for d in el.findall("g:data", ns)}
        nodes.append(
            (
                el.get("id"),
                attrs.get("entity_type", ""),
                attrs.get("description", ""),
                [s for s in attrs.get("source_id", "").split(GRAPH_FIELD_SEP) if s],
            )
        )
    for el in graph.findall("g:edge", ns):
        attrs = {keys[d.get("key")]: d.text or "" for d in el.findall("g:data", ns)}
        edges.append(
            (
                el.get("source"),
                el.get("target"),
                float(attrs.get("weight", 1.0)),
                attrs.get("description", ""),
                [s for s in attrs.get("source_id", "").split(GRAPH_FIELD_SEP) if s],
                int(attrs.get("order", 1)),
            )
        )
    from mmgraphrag_spark import schema

    return (
        spark.createDataFrame(nodes, schema.ENTITIES),
        spark.createDataFrame(edges, schema.EDGES),
    )
