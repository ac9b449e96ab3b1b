"""End-to-end pipeline vs the independent pure-Python oracle (SURVEY.md §5).

The north rule's acceptance bar: triple P/R >= 0.95 vs reference semantics.
The oracle (datagen.oracle_*) re-implements the reference merge/fusion rules
independently of the engine; here we compare sets.
"""

from __future__ import annotations

from mmgraphrag_spark import GRAPH_FIELD_SEP, datagen


def test_prefusion_entities_match_oracle(pipeline_out, corpus):
    oracle_ents, _ = datagen.oracle_text_graph(corpus)
    got = {
        r.entity_name: r
        for r in pipeline_out["entities_prefusion"].collect()
        # restrict to text-side entities (oracle is text-graph only)
        if not (
            r.entity_name.endswith('(IMAGE)"') or r.entity_name.startswith('"IMG_')
        )
    }
    assert set(got) == set(oracle_ents)
    for name, exp in oracle_ents.items():
        row = got[name]
        assert row.entity_type == exp["entity_type"], name
        assert row.description == exp["description"], name
        assert set(row.source_ids) == exp["source_ids"], name


def test_prefusion_edges_match_oracle(pipeline_out, corpus):
    _, oracle_edges = datagen.oracle_text_graph(corpus)
    got = {
        (r.src, r.tgt): r
        for r in pipeline_out["edges_prefusion"].collect()
        if not (r.src.startswith('"IMG_') or r.tgt.startswith('"IMG_'))
        and not (r.src.endswith('(IMAGE)"') or r.tgt.endswith('(IMAGE)"'))
    }
    assert set(got) == set(oracle_edges)
    for key, exp in oracle_edges.items():
        row = got[key]
        assert row.weight == exp["weight"], key
        assert row.description == GRAPH_FIELD_SEP.join(sorted(exp["descs"])), key
        assert set(row.source_ids) == exp["srcs"], key
        assert row.order == exp["order"], key


def test_alias_recall_precision(pipeline_out, corpus):
    """Fusion alias map P/R >= 0.95 vs the golden image->text alignment."""
    expected = datagen.oracle_alias(corpus)
    got = {
        r.alias: r.canonical
        for r in pipeline_out["aliases"].collect()
        if r.alias.endswith('(IMAGE)"')
    }
    tp = sum(1 for a, c in got.items() if expected.get(a) == c)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(expected), 1)
    assert precision >= 0.95, f"precision {precision:.3f} ({len(got)} predicted)"
    assert recall >= 0.95, f"recall {recall:.3f} ({len(expected)} expected)"


def test_triples_pr(pipeline_out, corpus):
    """Canonical triple set P/R >= 0.95 (the judge-facing metric)."""
    expected = datagen.oracle_triples(corpus)
    got = {
        (r.subj, r.obj, r.weight) for r in pipeline_out["triples"].collect()
    }
    tp = len(got & expected)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(expected), 1)
    assert precision >= 0.95, f"precision {precision:.3f}"
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_reingest_idempotent(spark, documents_df, pipeline_out):
    """Property: ingesting the same corpus twice (union of duplicates) yields
    the same entity/edge KEY sets and double weights only where expected —
    here we check the stronger invariant the reference guarantees via J1:
    chunk-level dedup makes re-ingestion a no-op on chunks."""
    from mmgraphrag_spark.operators import spans as S

    spans = S.explode_spans(documents_df.unionByName(documents_df))
    once = S.chunk_text_spans(S.explode_spans(documents_df))
    twice = S.chunk_text_spans(spans)
    assert once.count() == twice.count()


def test_media_spans_have_chunks(pipeline_out):
    media = pipeline_out["media_spans"].collect()
    assert len(media) > 0
    assert all(m.chunk_id is not None for m in media)


def test_pipeline_with_tokenizer_backend(spark, corpus, documents_df, pipeline_out):
    """P9 end-to-end: swapping the chunker to the tokenizer-backend path
    changes chunk boundaries/ids but must preserve the extracted triples on a
    corpus whose documents each fit one window."""
    from mmgraphrag_spark.backends.tokenizer import RegexTokenizerBackend
    from mmgraphrag_spark.pipeline import run_pipeline

    out = run_pipeline(spark, documents_df, tokenizer=RegexTokenizerBackend())
    got = {(r.subj, r.obj, r.weight) for r in out["triples"].collect()}
    exp = {(r.subj, r.obj, r.weight) for r in pipeline_out["triples"].collect()}
    assert got == exp


def test_long_docs_multi_window_extraction_exact(spark):
    """End-to-end over documents LONGER than one chunk window: sentences in
    the overlap region are genuinely present in two chunks and must be
    extracted twice (weight double-count — reference semantics: both chunks
    contain the sentence); sentences split across a window boundary are lost
    by BOTH engine and oracle identically. Exact (src, tgt, weight) equality
    against a window-aware pure-python oracle, not just P/R."""
    import hashlib
    import re

    from mmgraphrag_spark import datagen, schema
    from mmgraphrag_spark.pipeline import run_pipeline

    # deterministic long docs: 60 sentences each (~600 tokens)
    def doc_text(d):
        parts = []
        for i in range(30):
            k = (d * 31 + i) % 20
            parts.append(datagen.mention_sentence(k, i % 4))
            parts.append(datagen.relation_sentence(k, (k + 3) % 20, (i % 5) + 1, i % 4))
        return " ".join(parts)

    rows = [
        (f"doc-{d}", [("text", doc_text(d), "", 0)]) for d in range(3)
    ]
    docs = spark.createDataFrame(rows, schema.DOCUMENTS)
    max_tokens, overlap = 100, 20
    out = run_pipeline(
        spark, docs, chunk_max_tokens=max_tokens, chunk_overlap=overlap
    )
    got = {(r.src, r.tgt, r.weight) for r in out["edges"].collect()}

    # window-aware oracle: same whitespace windows, dedup by content, same
    # regex extraction, A2 weight sum over sorted pairs
    step = max_tokens - overlap
    seen, edges = set(), {}
    for d in range(3):
        toks = doc_text(d).split()
        for s in range(0, max(len(toks), 1), step):
            win = toks[s : s + max_tokens]
            if not win:
                continue
            content = " ".join(win)
            cid = hashlib.md5(content.encode()).hexdigest()
            if cid in seen:
                continue
            seen.add(cid)
            for m in datagen.RELATION_RE.finditer(content):
                a, b, w = int(m.group(1)), int(m.group(2)), int(m.group(3))
                key = tuple(sorted([f'"ENTITY_{a}"', f'"ENTITY_{b}"']))
                edges[key] = edges.get(key, 0.0) + float(w)
    exp = {(s, t, w) for (s, t), w in edges.items()}
    assert got == exp
    # sanity: the overlap really duplicated something (otherwise this test
    # proves nothing) — total oracle weight must exceed the single-count sum
    single = {}
    for d in range(3):
        for m in datagen.RELATION_RE.finditer(doc_text(d)):
            key = tuple(sorted([f'"ENTITY_{int(m.group(1))}"', f'"ENTITY_{int(m.group(2))}"']))
            single[key] = single.get(key, 0.0) + float(m.group(3))
    assert sum(edges.values()) > 0
    assert sum(edges.values()) != sum(single.values())  # overlap had an effect


def test_pipeline_image_extractor_mode(spark, documents_df):
    """L4-L6 wiring: with ``image_extractor`` set, image-side mentions come
    from the per-image LLM call sequence (parsed by the shared record
    grammar) instead of deterministic scene-record synthesis. Replies
    interleave nondeterministically across pool threads, so the assertions
    target the DETERMINISTIC tail of each wire string (ORI_IMG entity +
    weight-10 crop containment), which is reply-independent."""
    from mmgraphrag_spark.backends.llm import (
        ChatClient,
        MllmImageExtractor,
        ScriptedTransport,
    )
    from mmgraphrag_spark.pipeline import run_pipeline

    t = ScriptedTransport(["a described crop"])
    backend = MllmImageExtractor(ChatClient("http://fake", transport=t))
    out = run_pipeline(spark, documents_df, image_extractor=backend)

    pre = out["entities_prefusion"]
    ori = {
        r.entity_name
        for r in pre.filter("entity_type = '\"ORI_IMG\"'").collect()
    }
    assert ori, "expected ORI_IMG entities from the LLM image path"
    # ORI_IMG names are the upper-cased media_refs here (not IMG_-prefixed
    # like the deterministic path) — confirms the LLM branch actually ran
    media_refs = {
        r.media_ref.upper() for r in out["media_spans"].select("media_ref").collect()
    }
    assert ori == {f'"{m}"' for m in media_refs}
    # weight-10 crop containment edges (deterministic synthesis): crop names
    # carry the reference-style ...jpg suffix
    crop_edges = out["edges_prefusion"].filter(
        "weight >= 10 and (src like '%.JPG\"' or tgt like '%.JPG\"')"
    )
    assert crop_edges.count() > 0
    assert out["triples"].count() > 0
