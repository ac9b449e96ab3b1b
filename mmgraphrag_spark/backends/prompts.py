"""Prompt templates for the LLM-backed operators (SURVEY.md §2.9 L1-L13).

Written from scratch; functionally equivalent to the reference's prompt
surface (reference file:line cited per template) and emitting the SAME wire
format the parser consumes (prompt.py:190-192): records wrapped in
parentheses, fields separated by ``<|>``, records separated by ``##``,
terminated by ``<|COMPLETE|>``. Keeping the wire format identical means the
JVM-side parser (functions/records.py) works unchanged for both the
deterministic and the LLM backends.
"""

from __future__ import annotations

from mmgraphrag_spark import (
    COMPLETE_TAG,
    DEFAULT_ENTITY_TYPES,
    FIELD_SEP,
    RECORD_SEP,
)

# L1 — entity/relationship extraction (reference prompt.py:58-187)
ENTITY_EXTRACTION = f"""You extract a knowledge graph from text.

From the input below, list every entity and every relationship you find.
Allowed entity types: {{entity_types}}.

Output format, one record per line:
("entity"{FIELD_SEP}"<NAME IN CAPS>"{FIELD_SEP}"<TYPE IN CAPS>"{FIELD_SEP}<one-sentence description>)
("relationship"{FIELD_SEP}"<SOURCE>"{FIELD_SEP}"<TARGET>"{FIELD_SEP}<why they are related>{FIELD_SEP}<integer strength 1-10>)

Separate records with {RECORD_SEP} and finish with {COMPLETE_TAG}.

Input:
{{input_text}}
"""

# L1 gleaning round (prompt.py entity_continue_extraction lineage)
CONTINUE_EXTRACTION = (
    "Some entities or relationships were missed in the previous answer. "
    f"Add ONLY the missing ones, same format, finish with {COMPLETE_TAG}."
)

# L1 gleaning gate (prompt.py entity_if_loop_extraction lineage)
LOOP_PROBE = (
    "Were any entities or relationships still missed? Answer only YES or NO."
)

# L2 — description summarization (prompt.py:162-176)
SUMMARIZE_DESCRIPTIONS = """Merge the following descriptions of {entity_name}
into one comprehensive description. Resolve contradictions; write in third
person; include the entity name.

Descriptions:
{descriptions}
"""

# L3 — whole-image description + segmentation flag (prompt.py:198-285)
IMAGE_DESCRIPTION = """Describe this image in detail. Then decide whether the
image contains multiple distinct foreground objects that would benefit from
object segmentation. Reply as JSON: {"description": "...",
"segmentation": true|false}"""

# L5 — whole-image scene-graph extraction (prompt.py:287-329
# image_entity_extraction): system prompt carrying the record grammar +
# allowed entity types; the user turn is the short fixed instruction below
# (img2graph.py:431-434).
SCENE_EXTRACTION = f"""Extract a scene graph of this image: every visible
object as an entity record and every visual relation between objects as a
relationship record. Allowed entity types: {{entity_types}}.

Output format, one record per line:
("entity"{FIELD_SEP}"<NAME>"{FIELD_SEP}"<TYPE>"{FIELD_SEP}"<description of the object's attributes>")
("relationship"{FIELD_SEP}"<SOURCE>"{FIELD_SEP}"<TARGET>"{FIELD_SEP}"<why they are visually related>"{FIELD_SEP}<integer strength 1-10>)

Separate records with {RECORD_SEP} and finish with {COMPLETE_TAG}."""

SCENE_EXTRACTION_USER = (
    "Please output the results in the format provided above.\nOutput:"
)

# L4 — feature-block (crop) description (prompt.py
# feature_image_description_system/user): classify the crop as object /
# organism / person, then describe its attributes. Crops are
# black-background cutouts, so the background must not be described.
FEATURE_IMAGE_SYSTEM = """You describe image feature blocks (single-object
crops with a black background). First state the crop's category — object,
organism, or person — then describe the entity's visible attributes in
detail (name, color, shape, size, clothing/posture for people, species for
organisms). The entity may be partially visible. Never mention the black
background."""

FEATURE_IMAGE_USER = """Determine the category of this image feature block
(object, organism, or person) and give a detailed description of the
entity's features, in English."""

# L6 — crop <-> extracted-entity alignment (prompt.py
# entity_alignment_system/user): given a crop and the entity-description
# pairs extracted from the whole image, emit ONE relationship record tying
# the crop to the entity it depicts.
ENTITY_ALIGNMENT_SYSTEM = f"""Given an image feature block (named in the
user turn) and entity-description pairs extracted from the original image,
decide which entity the feature block depicts and output exactly one
relationship record:
("relationship"{FIELD_SEP}<Entity Name>{FIELD_SEP}<Feature Block Name>{FIELD_SEP}"The image feature block <Feature Block Name> is a picture of <Entity Name>."{FIELD_SEP}<integer strength 1-10>){RECORD_SEP}
Include the trailing {RECORD_SEP}."""

ENTITY_ALIGNMENT_USER = """The image feature block is as shown above, and
its name is {feature_image_name}.
Entity-Description: {entity_description}
Output:"""

# L7/L8 — cross-modal alignment judgment (prompt.py:588-682)
ALIGNMENT_JUDGE = """Candidate text entities: {candidates}
Image entity: {image_entity} — {image_description}
Which single candidate denotes the same real-world thing as the image entity?
Reply with exactly the candidate name, or "no match"."""

# L10 — enhance unaligned image entities (prompt.py enhance_image_entity_*)
ENHANCE_IMAGE_ENTITIES = """The following image-derived entities could not be
aligned to any text entity. Rewrite each with a clearer canonical name and a
fuller description, keeping the same order and count. Reply as a JSON list of
{{"entity_name": ..., "entity_type": ..., "description": ...}} objects.

Entities:
{entity_list}"""

# L11 — RAG answer (prompt.py:425-459)
# L9 — cluster-level fusion decision (reference fusion.py:495-533 shows the
# text clusters and the labeled image entities in one prompt and asks for a
# merged-entity JSON list; the field names are the wire format its parser —
# and ours — requires)
CLUSTER_FUSION_SYSTEM = (
    "You align image entities with text entities using their cluster labels "
    "and descriptions, and merge matching ones accurately."
)

CLUSTER_FUSION = """Clusters of text entities, grouped by label:
{clusters_json}

Image entities, each tagged with the label of its cluster:
{image_entities}

For every image entity, compare its description and type with the text
entities sharing its label. When an image entity and text entities describe
the same thing, emit ONE merged entity combining their descriptions. Reply
with ONLY a JSON list; each item must have exactly these fields:
    {{"entity_name": "new merged entity name",
      "entity_type": "type of the merged entity",
      "description": "merged description of the entity",
      "source_image_entities": ["matched image entity names"],
      "source_text_entities": ["matched text entity names"]}}"""

RAG_ANSWER = """Answer the question using only the context tables below.

{context}

Question: {question}
Answer:"""

# L12 — per-image multimodal answer (prompt.py local_rag_response_multimodal)
MM_ANSWER = """Answer the question using the context tables below AND the
attached image ({image_information}).

{context}

Question: {question}
Answer:"""

# L13 — merge the per-image answers (prompt.py local_rag_response_multimodal_merge)
MM_MERGE = """Combine the following per-image answers into one coherent
answer, dropping repetition and contradictions:

{mm_responses}

Question: {question}
Answer:"""

# L13 — final merge of text answer + merged multimodal answer
# (prompt.py local_rag_response_merge)
FINAL_MERGE = """Merge the text-evidence answer and the image-evidence answer
into one final answer. Prefer agreement; note genuine conflicts.

Text answer: {response}
Image answer: {mm_response}

Question: {question}
Answer:"""


def entity_extraction_prompt(input_text: str, entity_types=None) -> str:
    types = ", ".join(entity_types or DEFAULT_ENTITY_TYPES)
    return ENTITY_EXTRACTION.format(entity_types=types, input_text=input_text)
