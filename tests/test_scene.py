"""Scene-graph tests: C4 stand-in, P17 min-size filter, containment edges."""

from __future__ import annotations

from mmgraphrag_spark.operators import scene as SC


def _media(spark):
    return spark.createDataFrame(
        [
            ("img://d1/0", "d1", "Figure: ENTITY_3 with ENTITY_7.", "ctx", 2, "chunk-x", True)
        ],
        [
            "media_ref",
            "doc_id",
            "caption",
            "context",
            "chunk_order_index",
            "chunk_id",
            "segmentation",
        ],
    )


def test_detect_and_min_size_filter(spark):
    media = _media(spark)
    objects = SC.detect_scene_objects(media)
    rows = objects.orderBy("object_id").collect()
    # two caption entities + one undersized noise row
    assert [r.label for r in rows] == [
        "ENTITY_3 (IMAGE)",
        "ENTITY_7 (IMAGE)",
        "NOISE (IMAGE)",
    ]
    ents, rels = SC.scene_graph(media, objects)
    ent_rows = ents.collect()
    names = {r.entity_name for r in ent_rows}
    # P17: the 16x16 noise object must not survive
    assert '"NOISE (IMAGE)"' not in names
    assert '"IMG_img://d1/0"' in names
    assert '"ENTITY_3 (IMAGE)"' in names and '"ENTITY_7 (IMAGE)"' in names
    types = {r.entity_name: r.entity_type for r in ent_rows}
    assert types['"IMG_img://d1/0"'] == '"ORI_IMG"'
    assert types['"ENTITY_3 (IMAGE)"'] == '"IMG_ENTITY"'


def test_containment_edges_weight_10(spark):
    media = _media(spark)
    objects = SC.detect_scene_objects(media)
    _, rels = SC.scene_graph(media, objects)
    rows = rels.collect()
    assert len(rows) == 2  # one per kept object (img2graph.py:473-479)
    assert all(r.weight == 10.0 for r in rows)
    assert all(r.src <= r.tgt for r in rows)
    assert all(r.source_id == "img://d1/0" for r in rows)
