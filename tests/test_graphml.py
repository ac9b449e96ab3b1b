"""GraphML export/read round-trip (S5/W8 parity sink)."""

from __future__ import annotations

import pytest

from mmgraphrag_spark.sources.graphml import export_graphml, read_graphml


def test_graphml_roundtrip(spark, pipeline_out, tmp_path):
    path = str(tmp_path / "g.graphml")
    export_graphml(pipeline_out["entities"], pipeline_out["edges"], path)
    ents, edges = read_graphml(spark, path)
    orig_e = {
        (r.entity_name, r.entity_type, r.description, frozenset(r.source_ids))
        for r in pipeline_out["entities"].collect()
    }
    got_e = {
        (r.entity_name, r.entity_type, r.description, frozenset(r.source_ids))
        for r in ents.collect()
    }
    assert got_e == orig_e
    orig_g = {
        (r.src, r.tgt, r.weight, r.description) for r in pipeline_out["edges"].collect()
    }
    got_g = {(r.src, r.tgt, r.weight, r.description) for r in edges.collect()}
    assert got_g == orig_g


def test_graphml_size_guard(spark, pipeline_out, tmp_path):
    with pytest.raises(ValueError):
        export_graphml(
            pipeline_out["entities"], pipeline_out["edges"],
            str(tmp_path / "x.graphml"), max_rows=1,
        )
