"""Deterministic interleaved-document generator + pure-Python oracle.

Generates the input table of BASELINE.json's input_hint shape:
    documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
entirely in closed form (seeded), so the expected KG — entities, edges, alias map,
canonical triples — is computable by an independent pure-Python oracle
(reference semantics: text2graph.py:140-279 merge rules, fusion.py:936-991 merge
groups). No external data.

Text grammar the deterministic extractor understands (FIXTURES.md §1):
    mention  : "ENTITY_<k> is a <TYPE> associated with topic_<t>."
    relation : "ENTITY_<a> RELATES_TO ENTITY_<b> (w=<int>) regarding topic_<t>."
    caption  : "Figure: ENTITY_<a> with ENTITY_<b>."

Entities k in HUB_KS appear with very high frequency (hub-entity skew, SURVEY §7.4).
A few relation endpoints are never mentioned -> exercise dangling-node insert
(text2graph.py:258-268). Some entities get a conflicting type in a minority of
mentions -> exercise mode-of-type (text2graph.py:176-183). Duplicate spans across
docs -> exercise md5 dedup (preprocessing.py:107-151).
"""

from __future__ import annotations

import random
import re
from collections import Counter
from dataclasses import dataclass, field

TYPES = ["ORGANIZATION", "PERSON", "GEO", "EVENT"]
HUB_KS = (0, 1)          # hub entities: appear in a large share of spans
N_TOPICS = 7
GRAPH_FIELD_SEP = "<SEP>"

MENTION_RE = re.compile(r"ENTITY_(\d+) is a ([A-Z]+) associated with (topic_\d+)\.")
RELATION_RE = re.compile(
    r"ENTITY_(\d+) RELATES_TO ENTITY_(\d+) \(w=(\d+)\) regarding (topic_\d+)\."
)
CAPTION_RE = re.compile(r"ENTITY_(\d+)")

def entity_type(k: int) -> str:
    return TYPES[k % len(TYPES)]

def mention_sentence(k: int, topic: int, wrong_type: bool = False) -> str:
    t = TYPES[(k + 1) % len(TYPES)] if wrong_type else entity_type(k)
    return f"ENTITY_{k} is a {t} associated with topic_{topic}."

def relation_sentence(a: int, b: int, w: int, topic: int) -> str:
    return f"ENTITY_{a} RELATES_TO ENTITY_{b} (w={w}) regarding topic_{topic}."

@dataclass
class GenDoc:
    doc_id: str
    spans: list  # (kind, text, media_ref, offset)

@dataclass
class GenCorpus:
    docs: list = field(default_factory=list)
    # media_ref -> list of entity ks shown in the image (golden for fusion)
    media_entities: dict = field(default_factory=dict)

def generate_documents(
    n_docs: int = 40,
    n_entities: int = 60,
    seed: int = 42,
    spans_per_doc: int = 10,
    media_every: int = 4,
) -> GenCorpus:
    rng = random.Random(seed)
    corpus = GenCorpus()
    dup_span_text = (
        mention_sentence(2, 0) + " " + relation_sentence(2, 3, 2, 0)
    )  # identical span repeated across docs -> md5-dedup path
    for d in range(n_docs):
        doc_id = f"doc-{d:04d}"
        # pass 1: text spans (media slots left None), tracking mentioned ks per offset
        texts: list = [None] * spans_per_doc
        mentioned: list = [set() for _ in range(spans_per_doc)]
        media_offsets = [
            off for off in range(spans_per_doc) if off > 0 and off % media_every == 0
        ]
        for off in range(spans_per_doc):
            if off in media_offsets:
                continue
            if d % 7 == 0 and off == 1:
                texts[off] = dup_span_text
                mentioned[off].add(2)
                continue
            sentences = []
            for _ in range(rng.randint(2, 4)):
                if rng.random() < 0.5:
                    k = rng.choice(HUB_KS) if rng.random() < 0.25 else rng.randrange(n_entities)
                    wrong = rng.random() < 0.1
                    sentences.append(mention_sentence(k, rng.randrange(N_TOPICS), wrong))
                    mentioned[off].add(k)
                else:
                    a = rng.choice(HUB_KS) if rng.random() < 0.25 else rng.randrange(n_entities)
                    # a few endpoints beyond n_entities are never mentioned anywhere
                    b = rng.randrange(n_entities + 5)
                    if a == b:
                        b = (b + 1) % n_entities
                    w = rng.randint(1, 9)
                    sentences.append(relation_sentence(a, b, w, rng.randrange(N_TOPICS)))
            texts[off] = " ".join(sentences)
        # pass 2: media spans reference entities mentioned in +-1 neighbor text spans,
        # so the fusion neighborhood block (J3, fusion.py:156-202) contains the target
        n_media = 0
        for off in media_offsets:
            neighbor_ks = sorted(
                mentioned[off - 1] | (mentioned[off + 1] if off + 1 < spans_per_doc else set())
            )
            if not neighbor_ks:
                # force a mention into the preceding span so alignment is reachable
                k = rng.randrange(n_entities)
                texts[off - 1] += " " + mention_sentence(k, rng.randrange(N_TOPICS))
                mentioned[off - 1].add(k)
                neighbor_ks = [k]
            ks = sorted(set(rng.sample(neighbor_ks, min(2, len(neighbor_ks)))))
            media_ref = f"img://{doc_id}/{n_media}"
            caption = "Figure: " + " with ".join(f"ENTITY_{k}" for k in ks) + "."
            texts[off] = ("image", caption, media_ref)
            corpus.media_entities[media_ref] = ks
            n_media += 1
        spans = []
        for off in range(spans_per_doc):
            v = texts[off]
            if isinstance(v, tuple):
                spans.append((v[0], v[1], v[2], off))
            else:
                spans.append(("text", v, "", off))
        corpus.docs.append(GenDoc(doc_id, spans))
    return corpus

def corpus_rows(corpus: GenCorpus) -> list:
    """Rows matching schema.DOCUMENTS for spark.createDataFrame."""
    return [
        (d.doc_id, [(k, t, m, o) for (k, t, m, o) in d.spans])
        for d in corpus.docs
    ]

# ---------------------------------------------------------------------------
# Deterministic scene-object generation (YOLO+MLLM stand-in; FIXTURES.md §2)
# ---------------------------------------------------------------------------

def scene_objects(corpus: GenCorpus) -> list:
    """(media_ref, object_id, label, description, width, height) rows.

    Object names the engine derives: image entity '"ENTITY_<k> (IMAGE)"'.
    Some rows get width<=28 to exercise the min-size filter (img2graph.py:363-365);
    those must NOT appear in the output graph.
    """
    rows = []
    for media_ref, ks in sorted(corpus.media_entities.items()):
        for i, k in enumerate(ks):
            rows.append(
                (media_ref, i, f"ENTITY_{k} (IMAGE)",
                 f"object depicting ENTITY_{k} in {media_ref}", 64, 64)
            )
        # undersized detection, filtered out by P17
        rows.append((media_ref, len(ks), "NOISE (IMAGE)", "tiny artifact", 16, 16))
    return rows

# ---------------------------------------------------------------------------
# Pure-Python oracle — reference merge semantics, independent of the engine
# ---------------------------------------------------------------------------

def oracle_text_graph(corpus: GenCorpus) -> tuple[dict, dict]:
    """Expected text-KG entities and edges before fusion.

    Semantics mirrored from the reference:
      - entity merge by name: type = mode (Counter most_common), description =
        <SEP>-join of sorted set, source_ids = set of chunk ids
        (text2graph.py:176-191)
      - edge merge by sorted pair: weight sum, order min (=1 here), desc sorted set
        (text2graph.py:244-257, 442-443)
      - dangling endpoints inserted as '"UNKNOWN"' (text2graph.py:258-268)
    Chunk id = "chunk-" + md5(span text); duplicate spans share one chunk id.
    """
    import hashlib

    ent_types: dict[str, Counter] = {}
    ent_descs: dict[str, set] = {}
    ent_srcs: dict[str, set] = {}
    edges: dict[tuple, dict] = {}
    seen_chunks: set[str] = set()

    for doc in corpus.docs:
        for kind, text, media_ref, off in doc.spans:
            if kind != "text":
                continue
            chunk_id = "chunk-" + hashlib.md5(text.encode()).hexdigest()
            # duplicate spans collapse to one chunk (md5-id dedup, J1) and are
            # extracted exactly once, like the reference's keyed chunk store
            if chunk_id in seen_chunks:
                continue
            seen_chunks.add(chunk_id)
            for m in MENTION_RE.finditer(text):
                k, typ, topic = int(m.group(1)), m.group(2), m.group(3)
                name = f'"ENTITY_{k}"'
                ent_types.setdefault(name, Counter())[f'"{typ}"'] += 1
                ent_descs.setdefault(name, set()).add(
                    f"ENTITY_{k} is a {typ} associated with {topic}."
                )
                ent_srcs.setdefault(name, set()).add(chunk_id)
            for m in RELATION_RE.finditer(text):
                a, b, w, topic = int(m.group(1)), int(m.group(2)), int(m.group(3)), m.group(4)
                s, t = sorted([f'"ENTITY_{a}"', f'"ENTITY_{b}"'])
                e = edges.setdefault((s, t), {"weight": 0.0, "descs": set(), "srcs": set(), "order": 1})
                e["weight"] += float(w)
                e["descs"].add(f"relates regarding {topic}")
                e["srcs"].add(chunk_id)

    entities = {}
    for name, types in ent_types.items():
        # engine's documented mode tie-break: count desc, then type asc
        # (reference Counter.most_common ties are insertion-ordered; SURVEY §7.4)
        modal = sorted(types.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        entities[name] = {
            "entity_type": modal,
            "description": GRAPH_FIELD_SEP.join(sorted(ent_descs[name])),
            "source_ids": ent_srcs[name],
        }
    # dangling endpoints
    for (s, t) in edges:
        for n in (s, t):
            if n not in entities:
                entities[n] = {
                    "entity_type": '"UNKNOWN"',
                    "description": n,
                    "source_ids": set(),
                }
    return entities, edges

def oracle_alias(corpus: GenCorpus) -> dict:
    """Expected fusion alias map: image entity name -> canonical text entity name."""
    alias = {}
    for media_ref, ks in corpus.media_entities.items():
        for k in ks:
            alias[f'"ENTITY_{k} (IMAGE)"'] = f'"ENTITY_{k}"'
    return alias

def oracle_triples(corpus: GenCorpus) -> set:
    """Expected canonical (subj, pred-bucket, obj) set AFTER fusion contraction.

    pred is compared as the sorted-set description join; for P/R at triple level we
    compare (subj, obj) pairs plus weights — the judge-facing metric compares sets
    of (subj, obj, weight) with descriptions checked separately.
    """
    _, edges = oracle_text_graph(corpus)
    alias = oracle_alias(corpus)
    out = set()
    for (s, t), e in edges.items():
        s2, t2 = alias.get(s, s), alias.get(t, t)
        s2, t2 = sorted([s2, t2])
        out.add((s2, t2, e["weight"]))
    # image containment edges: ori_img -> canonical entity, weight 10 each
    for media_ref, ks in corpus.media_entities.items():
        img = f'"IMG_{media_ref}"'
        for k in ks:
            s2, t2 = sorted([img, f'"ENTITY_{k}"'])
            out.add((s2, t2, 10.0))
    return out
