"""OpenAI-compatible chat client + the LLM extraction backend (L1 with the
gleaning loop), executor-side.

Cross-cutting behaviors mirrored from the reference:
  - bounded in-flight concurrency (16; base.py:142-172) via a semaphore-capped
    thread pool per python worker,
  - retry with backoff on transient/rate-limit errors (3x; llm.py:19-32),
  - response memoization by args hash happens OUTSIDE this module as the
    llm_cache table join (J17, extract.extract_mentions) so only cache misses
    ever reach the network.

Pure stdlib (urllib) — no SDK dependency. Configure with base_url/api_key/
model (any OpenAI-compatible endpoint). This sandbox has no network; the
client is fully implemented and unit-tested against an injected transport.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from typing import Callable, Iterator

import pandas as pd

from mmgraphrag_spark.backends import prompts


class ScriptedTransport:
    """Offline transport: replays a fixed list of reply strings (an Exception
    entry raises instead). Lets the full client/extractor stack — retries,
    gleaning loop, Arrow batching — run without network; also the seam CI can
    use for recorded-response tests. Defined in the package (not test code) so
    Spark workers can unpickle it by reference."""

    def __init__(self, script: list):
        self.script = script
        self.n = 0
        self.calls: list[list[dict]] = []  # messages of each request, in order

    def __call__(self, url: str, headers: dict, payload: dict) -> str:
        # snapshot: callers mutate their history list between calls
        self.calls.append([dict(m) for m in payload.get("messages", [])])
        reply = self.script[min(self.n, len(self.script) - 1)]
        self.n += 1
        if isinstance(reply, Exception):
            raise reply
        return json.dumps({"choices": [{"message": {"content": reply}}]})


class ChatClient:
    """Minimal OpenAI-compatible /chat/completions client."""

    def __init__(
        self,
        base_url: str,
        api_key: str = "",
        model: str = "gpt-4o-mini",
        max_retries: int = 3,
        backoff_seconds: float = 2.0,
        timeout: float = 120.0,
        transport: Callable[[str, dict, dict], str] | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.max_retries = max_retries
        self.backoff_seconds = backoff_seconds
        self.timeout = timeout
        self._transport = transport or self._http_transport

    def _http_transport(self, url: str, headers: dict, payload: dict) -> str:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read().decode()

    def complete(self, messages: list[dict]) -> str:
        url = f"{self.base_url}/chat/completions"
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        payload = {"model": self.model, "messages": messages, "temperature": 0}
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                body = self._transport(url, headers, payload)
                data = json.loads(body)
                return data["choices"][0]["message"]["content"]
            except Exception as ex:  # transient/network/rate-limit
                last = ex
                if attempt + 1 < self.max_retries:
                    time.sleep(self.backoff_seconds * (attempt + 1))
        raise RuntimeError(f"chat completion failed after {self.max_retries} tries") from last


def salvage_json(output: str):
    """P16: extract + parse the first {...} block from sloppy LLM output
    (reference llm.py:145-159 normalize_to_json). Returns dict or None."""
    import re as _re

    m = _re.search(r"\{.*\}", output or "", _re.DOTALL)
    if not m:
        return None
    try:
        return json.loads(m.group(0))
    except json.JSONDecodeError:
        return None


def salvage_json_list(output: str) -> list:
    """P16: JSON-list extraction. Strict pass first — VALID JSON (including
    legitimately escaped quotes, e.g. '"\\"NAME\\""' entity names) parses
    as-is; the reference's unescape step (llm.py:161-190) would corrupt it.
    Then the reference's lenient path for sloppy output: unescape, grab the
    first [...] run, strip truncation commas; finally parse the {...} items
    one by one so a truncated reply still yields its complete prefix."""
    import re as _re

    raw = (output or "").strip()
    m = _re.search(r"\[.*\]", raw, _re.DOTALL)
    if m:
        try:
            obj = json.loads(m.group(0))
            if isinstance(obj, list):
                return obj
        except json.JSONDecodeError:
            pass
    cleaned = raw.replace('\\"', '"')
    m = _re.search(r"\[\s*(\{.*?\})*?\s*]", cleaned, _re.DOTALL)
    if m:
        s = _re.sub(r",\s*]", "]", m.group(0))
        s = _re.sub(r",\s*}$", "}", s)
        try:
            obj = json.loads(s)
            if isinstance(obj, list):
                return obj
        except json.JSONDecodeError:
            pass
    out = []
    for item in _re.findall(r"\{.*?\}", cleaned, _re.DOTALL):
        try:
            out.append(json.loads(item))
        except json.JSONDecodeError:
            continue
    return out


def _with_image_part(text: str, image_b64: str | None):
    """OpenAI multimodal content: plain string without an image, else a
    [text, image_url] part list with the full base64 as a data: URI. The
    mime is sniffed from the base64'd magic bytes (PNG/GIF/WEBP from DOCX
    and PDF XObjects are common) so strict endpoints that validate the
    declared content type accept the payload; JPEG is the fallback."""
    if not image_b64:
        return text
    mime = (
        "image/png" if image_b64.startswith("iVBOR")
        else "image/gif" if image_b64.startswith("R0lGOD")
        else "image/webp" if image_b64.startswith("UklGR")
        else "image/jpeg"
    )
    return [
        {"type": "text", "text": text},
        {"type": "image_url",
         "image_url": {"url": f"data:{mime};base64,{image_b64}"}},
    ]


class MllmDescriber:
    """L3 image description + segmentation gate (reference
    pdf2md_preprocessing.py:177-198 get_image_description): one MLLM call per
    media span returning {"description": ..., "segmentation": true|false}.
    Parsed with the reference's per-field regexes (NOT strict JSON — the
    reference tolerates malformed replies the same way), defaulting to
    ("No description.", False). The segmentation flag gates whether object
    detection runs for that image (operators.scene.detect_scene_objects).

    Image bytes ride as an OpenAI-style image_url content part (data: URI
    carrying the FULL base64) when available, matching the reference's
    multimodel_if_cache payload shape — a real multimodal endpoint receives
    the actual image, not a text placeholder."""

    def __init__(self, client: ChatClient):
        self.client = client

    def describe(self, caption: str, context: str, image_b64: str | None = None):
        import re as _re

        msg = prompts.IMAGE_DESCRIPTION + f"\n\nCaption: {caption}\nContext: {context}"
        content = _with_image_part(msg, image_b64)
        result = self.client.complete([{"role": "user", "content": content}])
        dm = _re.search(r'"description": "([^"]*)"', result)
        sm = _re.search(r'"segmentation": (\w+)', result)
        description = dm.group(1) if dm else "No description."
        segmentation = bool(sm) and sm.group(1).lower() == "true"
        return description, segmentation


class LLMJudge:
    """L7/L8 cross-modal alignment judge (reference fusion.py:227-242): one
    chat call per image entity offering its same-cluster text candidates; the
    reply must be exactly one of the offered candidate names — "no match" or
    any other reply means no alignment (the reference validates the returned
    name against the candidate list the same way). Plug into
    ``operators.fusion.judge_alignment(clustered, backend=LLMJudge(client))``.
    """

    def __init__(self, client: ChatClient):
        self.client = client

    def judge(self, image_name: str, image_description: str, candidates: list[str]):
        if not candidates:
            return None
        msg = prompts.ALIGNMENT_JUDGE.format(
            candidates=", ".join(candidates),
            image_entity=image_name,
            image_description=image_description or "",
        )
        reply = self.client.complete([{"role": "user", "content": msg}]).strip()
        if reply in candidates:
            return reply
        # tolerate quote-wrapping drift between the record grammar and the reply
        bare = reply.strip('"')
        for c in candidates:
            if bare == c.strip('"'):
                return c
        return None


class LLMClusterFuser:
    """L9 cluster-level fusion decision (reference fusion.py:459-545
    judge_text_entity_alignment_clustering): ONE chat call per image KG,
    shown every text cluster and all labeled image entities at once; the
    reply is a JSON list of NEW merged entities, each carrying its
    ``source_image_entities`` / ``source_text_entities``. Items missing
    either source list are dropped — the reference filters identically
    (fusion.py:539-544). Plug into
    ``operators.fusion.cluster_fusion(clustered, entities, backend=...)``."""

    def __init__(self, client: ChatClient):
        self.client = client

    def fuse(self, clusters: list[dict], image_entities: list[dict]) -> list[dict]:
        if not clusters or not image_entities:
            return []
        msg = prompts.CLUSTER_FUSION.format(
            clusters_json=json.dumps({"clusters": clusters}, ensure_ascii=False),
            image_entities=json.dumps(image_entities, ensure_ascii=False),
        )
        reply = self.client.complete(
            [
                {"role": "system", "content": prompts.CLUSTER_FUSION_SYSTEM},
                {"role": "user", "content": msg},
            ]
        )
        return [
            it
            for it in salvage_json_list(reply)
            if isinstance(it, dict)
            and it.get("source_image_entities")
            and it.get("source_text_entities")
        ]


class LLMAnswerer:
    """L11-L13 answer backends over a real ChatClient, drop-in for
    query.TemplateAnswerer (same answer/answer_image/merge protocol).

    Mirrors the reference's multimodal query tail (query.py:402-468): one text
    answer (L11), one answer per ranked image entity with the context + image
    information in the system prompt (L12), then a TWO-step merge — combine
    the per-image answers, then merge that with the text answer (L13)."""

    def __init__(self, client: ChatClient):
        self.client = client

    def answer(self, question: str, context: str) -> str:
        return self.client.complete(
            [{"role": "user",
              "content": prompts.RAG_ANSWER.format(context=context, question=question)}]
        ).strip()

    def answer_image(
        self, question: str, media_ref: str, context: str, image_b64: str | None = None
    ) -> str:
        msg = prompts.MM_ANSWER.format(
            image_information=media_ref, context=context, question=question
        )
        # image bytes travel as a full-b64 image_url part (reference
        # query.py:434-436 sends the base64 content, not just the ref)
        content = _with_image_part(msg, image_b64)
        return self.client.complete([{"role": "user", "content": content}]).strip()

    def merge(self, question: str, answers: list[str]) -> str:
        if len(answers) <= 1:
            return answers[0] if answers else ""
        text_answer, img_answers = answers[0], answers[1:]
        mm_merged = self.client.complete(
            [{"role": "user",
              "content": prompts.MM_MERGE.format(
                  mm_responses="\n---\n".join(img_answers), question=question)}]
        ).strip()
        return self.client.complete(
            [{"role": "user",
              "content": prompts.FINAL_MERGE.format(
                  response=text_answer, mm_response=mm_merged, question=question)}]
        ).strip()


class LLMEnhancer:
    """L10: enhance UNALIGNED image entities (reference fusion.py:588-595
    enhance_image_entities): one chat call per batch listing the entities;
    the reply is salvaged as a JSON list (P16) and matched back BY POSITION —
    a reply whose length differs from the request is discarded wholesale
    (enhancement is best-effort; the entities keep their own names then,
    which is also the offline default)."""

    def __init__(self, client: ChatClient):
        self.client = client

    def enhance(self, items: list[dict]) -> list[dict] | None:
        if not items:
            return []
        listing = json.dumps(items, ensure_ascii=False, indent=0)
        msg = prompts.ENHANCE_IMAGE_ENTITIES.format(entity_list=listing)
        reply = self.client.complete([{"role": "user", "content": msg}])
        out = salvage_json_list(reply)
        if len(out) != len(items):
            return None
        return out


class LLMSummarizer:
    """L2/A3 description summarizer (text2graph.py:73-116): invoked only for
    descriptions whose token count crossed the threshold — the filter and
    join-back live in ``operators.merge.summarize_long_descriptions``; this
    class only owns the prompt + chat call. The prompt lists the
    GRAPH_FIELD_SEP-split description fragments like the reference's
    description_list."""

    def __init__(self, client: ChatClient):
        self.client = client

    def summarize(self, entity_name: str, description: str) -> str:
        from mmgraphrag_spark import GRAPH_FIELD_SEP

        frags = (description or "").split(GRAPH_FIELD_SEP)
        msg = prompts.SUMMARIZE_DESCRIPTIONS.format(
            entity_name=entity_name, descriptions="\n".join(frags)
        )
        return self.client.complete([{"role": "user", "content": msg}]).strip()


def _pooled_records_batches(backend, it, id_col, arg_cols, fn):
    """Shared executor-side scaffold for record-emitting LLM backends
    (LLMExtractor, MllmImageExtractor): eager worker-side semaphore (locks
    don't pickle, so it can't be built driver-side; lazy per-thread creation
    raced and could over-admit), a semaphore-capped thread pool, and one
    (chunk_id, doc_id, records) row per input row. Fix concurrency behavior
    HERE, once."""
    from concurrent.futures import ThreadPoolExecutor

    backend._sem = threading.Semaphore(backend.max_concurrency)
    with ThreadPoolExecutor(max_workers=backend.max_concurrency) as pool:
        for pdf in it:
            recs = list(pool.map(fn, zip(*(pdf[c] for c in arg_cols))))
            yield pd.DataFrame(
                {"chunk_id": pdf[id_col], "doc_id": pdf["doc_id"],
                 "records": recs}
            )


def format_result(result: str) -> str:
    """P15 (img2graph.py:483-487): project the entity records out of a raw
    extraction reply as '"name"-"description"' lines — the entity-description
    listing the L6 alignment prompt consumes."""
    import re as _re

    pairs = _re.findall(
        r'\("entity"<\|>"([^"]+)"<\|>"[^"]*"<\|>"([^"]+)"\)', result or ""
    )
    return "\n".join(f'"{name}"-"{desc}"' for name, desc in pairs)


class MllmImageExtractor:
    """L4-L6: the reference's per-image MLLM call sequence (img2graph.py
    extract_entities, :489-514), emitting ONE record-grammar wire string per
    image so the SAME JVM parser (functions/records.py, via
    extract.parse_mentions) consumes image- and text-side output alike.

    Per image, in reference order:
      1. L4 (img2graph.py:348-385): one describe call per feature-block crop
         (feature-image prompts + crop bytes as an image_url part) -> entity
         record ``("entity"<|>"{crop}"<|>"img"<|>"{description}")##``.
      2. L5 (img2graph.py:420-442): ONE whole-image extraction call (scene
         record grammar + entity types in the system turn, short fixed user
         turn) -> raw entity/relationship records.
      3. P15: format_result projects L5's entities to '"name"-"desc"' lines.
      4. L6 (img2graph.py:387-418): one alignment call per crop (P15 listing
         + crop name + crop bytes) -> relationship record tying the crop to
         the entity it depicts (the raw reply is appended; the record parser
         downstream ignores malformed output, as the reference's does).
      5. Deterministic synthesis (img2graph.py:444-481
         entity_of_original_image): the ORI_IMG entity record plus weight-10
         containment records crop->image (crop names regexed from step 1)
         and entity->image (entity names regexed from step 2).

    The min-size crop gate (>28x28, img2graph.py:362-365) runs upstream in
    the Spark plan (operators.scene.extract_image_mentions) so undersized
    crops never reach a paid call."""

    def __init__(
        self,
        client: ChatClient,
        entity_types: list[str] | None = None,
        max_concurrency: int = 16,
    ):
        from mmgraphrag_spark import DEFAULT_ENTITY_TYPES

        self.client = client
        self.entity_types = entity_types or DEFAULT_ENTITY_TYPES
        self.max_concurrency = max_concurrency
        self._sem = None  # created worker-side (locks don't pickle)

    def _describe_crop(self, crop_name: str, crop_b64: str | None) -> str:
        desc = self.client.complete(
            [
                {"role": "system", "content": prompts.FEATURE_IMAGE_SYSTEM},
                {"role": "user",
                 "content": _with_image_part(prompts.FEATURE_IMAGE_USER, crop_b64)},
            ]
        ).replace("\n", " ").strip()
        rec = f'("entity"<|>"{crop_name}"<|>"img"<|>"{desc}")##'
        # reference normalization (img2graph.py:380-381)
        return rec.replace("('", "(").replace("')", ")")

    def _extract_whole(self, image_b64: str | None) -> str:
        system = prompts.SCENE_EXTRACTION.format(
            entity_types=", ".join(self.entity_types)
        )
        return self.client.complete(
            [
                {"role": "system", "content": system},
                {"role": "user",
                 "content": _with_image_part(prompts.SCENE_EXTRACTION_USER, image_b64)},
            ]
        )

    def _align_crop(
        self, crop_name: str, crop_b64: str | None, entity_listing: str
    ) -> str:
        user = prompts.ENTITY_ALIGNMENT_USER.format(
            feature_image_name=crop_name, entity_description=entity_listing
        )
        return self.client.complete(
            [
                {"role": "system", "content": prompts.ENTITY_ALIGNMENT_SYSTEM},
                {"role": "user", "content": _with_image_part(user, crop_b64)},
            ]
        )

    def extract_image(
        self,
        image_name: str,
        description: str,
        image_b64: str | None,
        crops: list[dict],
    ) -> str:
        """One image -> the combined wire string (img2graph.py:509-514)."""
        import re as _re

        def _sep(reply: str) -> str:
            # the record parser splits on '##' / '<|COMPLETE|>' ONLY — a
            # newline is not a separator. The prompt asks for a trailing
            # '##' but compliance isn't guaranteed; a reply without it
            # would merge with the next (deterministic) record and destroy
            # the ORI_IMG entity, so enforce the separator here.
            reply = (reply or "").strip()
            if reply and not (
                reply.endswith("##") or reply.endswith("<|COMPLETE|>")
            ):
                reply += "##"
            return reply

        if self._sem is None:
            self._sem = threading.Semaphore(self.max_concurrency)
        with self._sem:
            result1 = [
                _sep(self._describe_crop(c["name"], c.get("b64"))) for c in crops
            ]
            result2 = self._extract_whole(image_b64)
            listing = format_result(result2)
            result3 = [
                _sep(self._align_crop(c["name"], c.get("b64"), listing))
                for c in crops
            ]
            # deterministic tail (entity_of_original_image)
            ori = (
                f'("entity"<|>"{image_name}"<|>"ori_img"<|>"{description}")##'
                .replace("('", "(").replace("')", ")").replace("\n", " ")
            )
            result4 = [ori]
            for rec in result1:
                m = _re.findall(r'"([^"]+?\.jpg)"', rec)
                if m:
                    result4.append(
                        f'("relationship"<|>"{m[0]}"<|>"{image_name}"<|>'
                        f'"{m[0]} is an image feature block of {image_name}."'
                        f"<|>10)##"
                    )
            for name in _re.findall(r'"entity"<\|>"([^"]+?)"', result2):
                result4.append(
                    f'("relationship"<|>"{name}"<|>"{image_name}"<|>'
                    f'"{name} is an entity extracted from {image_name}."<|>10)##'
                )
            return "\n" + "\n".join(result1 + result3 + result4) + result2.strip()

    def map_batches(self, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """(media_ref, doc_id, description, _img_b64, _crops) batches ->
        (chunk_id=media_ref, doc_id, records) via the shared pooled
        scaffold. _crops arrives as a numpy array of struct dicts — `row[3]
        or []` would raise on multi-element arrays, hence the explicit None
        check."""
        yield from _pooled_records_batches(
            self, it, "media_ref",
            ["media_ref", "description", "_img_b64", "_crops"],
            lambda row: self.extract_image(
                row[0], row[1] or "", row[2],
                [] if row[3] is None else list(row[3]),
            ),
        )


class LLMExtractor:
    """L1 extraction with the gleaning loop (text2graph.py:346-369): initial
    extraction, then up to ``max_gleaning`` continuation rounds. Reference
    order: each round runs the continuation UNCONDITIONALLY first; the YES/NO
    probe runs only between rounds (never after the last) and gates whether an
    ADDITIONAL round happens — at max_gleaning=1 exactly one continuation call
    is made and the probe is never sent. The probe exchange is NOT appended to
    the conversation history (text2graph.py:361-369). Emits the record-grammar
    wire string per chunk."""

    def __init__(
        self,
        client: ChatClient,
        entity_types: list[str] | None = None,
        max_gleaning: int = 1,
        max_concurrency: int = 16,
    ):
        self.client = client
        self.entity_types = entity_types
        self.max_gleaning = max_gleaning
        self.max_concurrency = max_concurrency
        self._sem = None  # created lazily WORKER-side (locks don't pickle)

    def _extract_one(self, content: str) -> str:
        if self._sem is None:  # direct (single-threaded) calls only; map_batches
            self._sem = threading.Semaphore(self.max_concurrency)  # creates eagerly
        with self._sem:
            history = [
                {"role": "user",
                 "content": prompts.entity_extraction_prompt(content, self.entity_types)}
            ]
            out = self.client.complete(history)
            history.append({"role": "assistant", "content": out})
            records = [out]
            for glean_index in range(self.max_gleaning):
                # unconditional continuation (reference: glean first, probe after)
                history.append({"role": "user", "content": prompts.CONTINUE_EXTRACTION})
                out = self.client.complete(history)
                history.append({"role": "assistant", "content": out})
                records.append(out)
                if glean_index == self.max_gleaning - 1:
                    break
                # probe gates ADDITIONAL rounds only; its exchange stays out of
                # history, and only an exact (quote-stripped, lowercased) "yes"
                # continues (text2graph.py:361-369)
                probe = self.client.complete(
                    history + [{"role": "user", "content": prompts.LOOP_PROBE}]
                )
                if probe.strip().strip('"').strip("'").lower() != "yes":
                    break
            return "##".join(records)

    def map_batches(self, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _pooled_records_batches(
            self, it, "chunk_id", ["content"],
            lambda row: self._extract_one(row[0]),
        )
