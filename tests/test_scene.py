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


def test_describe_media_gates_segmentation(spark):
    """L3: the describer's segmentation flag replaces the default and gates
    object detection; ORI_IMG takes the MLLM description."""
    from mmgraphrag_spark.backends.llm import ChatClient, MllmDescriber, ScriptedTransport
    from mmgraphrag_spark.operators.scene import (
        describe_media,
        detect_scene_objects,
        scene_graph,
    )

    media = spark.createDataFrame(
        [
            ("img://a/0", "d1", "Figure: ENTITY_1.", "ctx", 1, "chunk-x", True),
            ("img://b/0", "d2", "Figure: ENTITY_2.", "ctx", 1, "chunk-y", True),
        ],
        ["media_ref", "doc_id", "caption", "context", "chunk_order_index",
         "chunk_id", "segmentation"],
    )
    # scripted: first image multi-object (segmentation true), second not.
    # NOTE: rows may arrive in either order across partitions, so key the
    # reply off nothing — instead run two describers, one per row, via a
    # content-sensitive transport.
    class EchoTransport:
        def __call__(self, url, headers, payload):
            import json as _json

            msg = payload["messages"][-1]["content"]
            seg = "true" if "ENTITY_1" in msg else "false"
            return _json.dumps({"choices": [{"message": {"content":
                '{"description": "desc of %s", "segmentation": %s}'
                % ("one" if seg == "true" else "two", seg)}}]})

    client = ChatClient("http://fake", transport=EchoTransport())
    described = describe_media(media, MllmDescriber(client))
    rows = {r.media_ref: (r.segmentation, r.mllm_description) for r in described.collect()}
    assert rows["img://a/0"] == (True, "desc of one")
    assert rows["img://b/0"] == (False, "desc of two")

    objects = detect_scene_objects(described)
    # only the segmentation=true image produced objects
    assert {r.media_ref for r in objects.collect()} == {"img://a/0"}

    ents, _ = scene_graph(described, objects)
    ori = {r.entity_name: r.description for r in ents.collect()
           if r.entity_name.startswith('"IMG_img')}
    assert ori['"IMG_img://a/0"'] == "desc of one"
    assert ori['"IMG_img://b/0"'] == "desc of two"


def test_describe_media_ships_base64_bytes(spark):
    """P22: media bytes join by ref and reach the describer as base64
    (encoded JVM-side); spans without bytes see None."""
    import base64

    from mmgraphrag_spark.backends.llm import ChatClient, MllmDescriber
    from mmgraphrag_spark.operators.scene import describe_media

    media = spark.createDataFrame(
        [
            ("img://a/0", "d1", "cap a", "ctx", 1, "c1", True),
            ("img://b/0", "d2", "cap b", "ctx", 1, "c2", True),
        ],
        ["media_ref", "doc_id", "caption", "context", "chunk_order_index",
         "chunk_id", "segmentation"],
    )
    blob = b"\x89PNGbytes"
    media_bytes = spark.createDataFrame(
        [("img://a/0", bytearray(blob))], ["media_ref", "content"]
    )

    # the PNG magic bytes must be declared as image/png in the data: URI
    # (mime sniffed from the base64 prefix — strict endpoints validate it)
    want_url = "data:image/png;base64," + base64.b64encode(blob).decode()

    class B64EchoTransport:
        def __call__(self, url, headers, payload):
            import json as _json

            msg = payload["messages"][-1]["content"]
            # with bytes: an OpenAI-style [text, image_url] part list whose
            # data: URI carries the FULL base64 — not a truncated placeholder
            seen = "withimg" if (
                isinstance(msg, list)
                and any(p.get("type") == "image_url"
                        and p["image_url"]["url"] == want_url for p in msg)
            ) else "noimg"
            return _json.dumps({"choices": [{"message": {"content":
                '{"description": "%s", "segmentation": false}' % seen}}]})

    client = ChatClient("http://fake", transport=B64EchoTransport())
    out = describe_media(media, MllmDescriber(client), media_bytes=media_bytes)
    got = {r.media_ref: r.mllm_description for r in out.collect()}
    assert got["img://a/0"] == "withimg"   # bytes joined and base64 shipped
    assert got["img://b/0"] == "noimg"     # no bytes row -> no image payload
