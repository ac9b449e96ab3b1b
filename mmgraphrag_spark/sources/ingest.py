"""File ingestion -> interleaved documents table (S1-S3 equivalents).

The reference ingests DOCX/PDF via python-docx / PyMuPDF / MinerU
(preprocessing.py:299-375, pdf_preprocessing.py:314-400,
pdf2md_preprocessing.py:317-457) — none of those libraries ship in this
container, and the MinerU path itself converts PDF -> markdown first. The
engine therefore ingests the COMMON DENOMINATOR those all produce: markdown /
plain text with inline image references. A production DOCX/PDF front-end
plugs in ahead of this (it only needs to emit markdown), exactly like the
reference's MinerU subprocess (S3).

``read_markdown_dir`` is fully distributed: wholetext file reads -> paragraph
split -> span classification, all JVM expressions; doc_id = "doc-" + md5(text)
(the reference's id derivation, preprocessing.py:107-110).

Markdown conventions handled:
  - paragraphs separated by blank lines become text spans
  - a paragraph that IS an image tag ``![caption](ref)`` becomes an image span
    (caption text kept — the reference's caption field)
  - inline image tags inside a paragraph are scrubbed from the text span and
    appended as separate image spans after it (P13 scrub, pdf2md:260-263)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_IMG_RE = r"!\[([^\]]*)\]\(([^)]*)\)"


def read_markdown_dir(spark: SparkSession, path: str, glob: str = "*.md") -> DataFrame:
    """Directory of markdown files -> documents(doc_id, spans)."""
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(f"{path}/{glob}")
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("text"),
        )
    )
    return markdown_to_documents(raw)


def markdown_to_documents(raw: DataFrame) -> DataFrame:
    """(file, text) -> documents(doc_id, spans). Pure DataFrame ops."""
    doc_id = F.concat(F.lit("doc-"), F.md5(F.col("text")))
    paras = F.split(F.col("text"), r"\n\s*\n")
    d = raw.select(doc_id.alias("doc_id"), F.posexplode(paras).alias("pord", "para"))
    d = d.withColumn("para", F.trim(F.col("para"))).filter(F.col("para") != "")

    # pure-image paragraph?
    is_img = F.col("para").rlike(r"^" + _IMG_RE + r"$")
    # text content with inline image tags scrubbed (P13)
    text_clean = F.trim(F.regexp_replace(F.col("para"), _IMG_RE, " "))
    # all image tags in the paragraph: array<struct<caption, ref>>
    caps = F.regexp_extract_all(F.col("para"), F.lit(_IMG_RE), 1)
    # strip a leading ./ so `![cap](./images/x.png)` and `(images/x.png)`
    # carry the SAME ref — read_markdown_media keys its bytes table by the
    # path relative to the corpus root, and the join is exact-string
    refs = F.transform(
        F.regexp_extract_all(F.col("para"), F.lit(_IMG_RE), 2),
        lambda r: F.regexp_replace(r, r"^\./", ""),
    )
    imgs = F.zip_with(
        caps, refs,
        lambda c, r: F.struct(c.alias("caption"), r.alias("ref")),
    )

    # emit: one text sub-span (when non-empty) then the paragraph's image
    # sub-spans, in order
    text_span = F.when(
        (~is_img) & (text_clean != ""),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                text_clean.alias("text"),
                F.lit("").alias("media_ref"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string>>"))
    img_spans = F.transform(
        imgs,
        lambda s: F.struct(
            F.lit("image").alias("kind"),
            s.getField("caption").alias("text"),
            s.getField("ref").alias("media_ref"),
        ),
    )
    d = d.select(
        "doc_id", "pord", F.concat(text_span, img_spans).alias("sub")
    ).select(
        "doc_id",
        "pord",
        F.posexplode("sub").alias("sord", "span"),
    ).select(
        "doc_id", "pord", "sord",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
    return _collect_documents(d)


def read_markdown_media(
    spark: SparkSession,
    path: str,
    glob: str = "*.{jpg,jpeg,png,gif,bmp,webp,JPG,JPEG,PNG,GIF,BMP,WEBP}",
) -> DataFrame:
    """MinerU-layout image bytes -> (media_ref, mime, content) binary table.

    The reference's input_mode 2 reads a MinerU output directory where the
    extracted images live beside the .md and the markdown tags reference
    them RELATIVELY (``![cap](images/x.jpg)``, pdf2md_preprocessing.py
    layout). This is the S7 media-bytes side of read_markdown_dir:
    media_ref is the image file's path relative to ``path`` — exactly the
    tag text markdown_to_documents emits — so the two tables join.
    Distributed: Spark's binaryFile source recursively lists + splits the
    image files across tasks; no driver-side IO. Absolute/external refs
    (http, /abs) aren't covered — pass an explicit media_bytes table for
    those layouts."""
    import os
    import re

    # a RELATIVE local root would never prefix-match the absolute file URIs
    # Spark lists, leaving media_ref as a full path that joins nothing —
    # absolutize up front (scheme'd URIs pass through untouched)
    if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", path):
        path = os.path.abspath(path)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    mimes = {
        "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
        "gif": "image/gif", "bmp": "image/bmp", "webp": "image/webp",
    }
    root = _file_key(path).rstrip("/")
    rel = F.regexp_replace(
        F.regexp_replace(F.col("path"), r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?", ""),
        "^/*" + re.escape(root) + "/",
        "",
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in mimes.items() for x in kv]
        )[ext],
        F.lit("application/octet-stream"),
    )
    return raw.select(
        rel.alias("media_ref"), mime.alias("mime"), F.col("content")
    )


def _collect_documents(flat: DataFrame) -> DataFrame:
    """(doc_id, pord, sord, kind, text, media_ref) -> documents(doc_id, spans)
    with per-doc offsets in (pord, sord) order. Shared by every front-end
    (markdown, DOCX, ...) — one window shuffle on doc_id.

    Rows are deduplicated on (doc_id, pord, sord) first: content-identical
    FILES intentionally share a doc_id (same text + same media refs = the
    same document), and without the dedup their span rows would interleave
    into one doubled, offset-corrupted doc."""
    w = Window.partitionBy("doc_id").orderBy("pord", "sord")
    d = flat.dropDuplicates(["doc_id", "pord", "sord"]).withColumn(
        "offset", F.row_number().over(w) - 1
    )
    spans = F.collect_list(
        F.struct(
            F.col("kind").alias("kind"),
            F.col("text").alias("text"),
            F.col("media_ref").alias("media_ref"),
            F.col("offset").alias("offset"),
        )
    )
    grouped = d.groupBy("doc_id").agg(spans.alias("_spans"))
    # collect_list order is nondeterministic across shuffles — re-sort by
    # offset explicitly via transform over a sorted (offset, span) sequence
    by_offset = F.transform(
        F.array_sort(
            F.transform(
                F.col("_spans"),
                lambda s: F.struct(
                    s.getField("offset").alias("o"),
                    s.alias("s"),
                ),
            )
        ),
        lambda x: x.getField("s"),
    )
    return grouped.select("doc_id", by_offset.alias("spans"))


# ---------------------------------------------------------------------------
# S1: DOCX front-end (stdlib zipfile + ElementTree — no python-docx needed)
# ---------------------------------------------------------------------------

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _file_key(fpath: str) -> str:
    """Scheme-stripped FULL path. media_refs must stay unique across
    same-named files in different directories (binaryFile loads recursively),
    so refs embed the whole path, never just the basename. Hadoop URIs come
    as ``file:/x`` or ``s3a://bucket/x`` — strip ``scheme:`` and any leading
    slashes."""
    import re

    return re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?", "", fpath).lstrip("/")


def _doc_id(full_text: str, rows) -> str:
    """"doc-" + md5 over the extracted text AND the ordered media refs.
    Hashing text alone merges media-only files (CID-font PDFs, scanned docs
    all extract the same empty text) into one corrupted document; media refs
    embed the file path, so distinct files never collide, while a
    byte-identical re-ingest of the same path still dedups."""
    import hashlib

    refs = "\x00".join(ref for (_, _, kind, _, ref) in rows if kind != "text")
    return (
        "doc-" + hashlib.md5((full_text + "\x00" + refs).encode("utf-8")).hexdigest()
    )


def _parse_docx_bytes(name: str, blob: bytes):
    """One .docx -> (full_text, [(pord, sord, kind, text, media_ref)]).

    Mirrors the reference walk (preprocessing.py:299-375): full text is the
    newline-join of paragraph texts (python-docx ``doc.paragraphs``); images
    are the in-order ``w:drawing//a:blip`` elements whose ``r:embed`` id is
    resolved through word/_rels/document.xml.rels to the media part. Runs
    executor-side on the binaryFile content column — pure stdlib."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        doc_xml = z.read("word/document.xml")
        try:
            rels_xml = z.read("word/_rels/document.xml.rels")
        except KeyError:
            rels_xml = None
    rels = {}
    if rels_xml is not None:
        for rel in ET.fromstring(rels_xml).iter(f"{_REL_NS}Relationship"):
            rels[rel.get("Id")] = rel.get("Target") or ""
    root = ET.fromstring(doc_xml)
    body = root.find(f"{_W_NS}body")
    rows, texts = [], []
    for pord, p in enumerate([] if body is None else body.findall(f"{_W_NS}p")):
        text = "".join(t.text or "" for t in p.iter(f"{_W_NS}t"))
        texts.append(text)
        sord = 0
        if text.strip():
            rows.append((pord, sord, "text", text.strip(), ""))
            sord += 1
        for blip in p.iter(f"{_A_NS}blip"):
            target = rels.get(blip.get(f"{_R_NS}embed"), "") or "unresolved"
            rows.append(
                (pord, sord, "image", "", f"docx://{name}/{target.lstrip('/')}")
            )
            sord += 1
    return "\n".join(texts), rows


def read_docx_dir(spark: SparkSession, path: str, glob: str = "*.docx") -> DataFrame:
    """Directory of .docx files -> documents(doc_id, spans).

    Distributed: Spark's binaryFile source splits files across tasks; each
    task unzips + XML-walks its files (stdlib, Arrow-batched). doc_id =
    "doc-" + md5(full text + ordered media refs) — see _doc_id; because the
    refs embed the file path, cross-PATH dedup of media-bearing files is
    intentionally disabled (text-only files still dedup by content alone).
    The markdown front-end's text-only derivation is the text-only special
    case (reference preprocessing.py:107-110)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def run(batches):
        import hashlib
        import os

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "pord", "sord", "kind", "text", "media_ref")}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                name = _file_key(fpath)
                full_text, rows = _parse_docx_bytes(name, bytes(blob))
                did = _doc_id(full_text, rows)
                for pord, sord, kind, text, ref in rows:
                    out["doc_id"].append(did)
                    out["pord"].append(pord)
                    out["sord"].append(sord)
                    out["kind"].append(kind)
                    out["text"].append(text)
                    out["media_ref"].append(ref)
            yield pd.DataFrame(out)

    flat = raw.mapInPandas(
        run,
        "doc_id string, pord int, sord int, kind string, text string, media_ref string",
    )
    return _collect_documents(flat)


# ---------------------------------------------------------------------------
# S2: PDF front-end (stdlib mini-parser — zlib Flate + text operators)
# ---------------------------------------------------------------------------

def _pdf_objects(blob: bytes) -> dict:
    import re

    return {
        int(m.group(1)): m.group(2)
        for m in re.finditer(rb"(\d+)\s+0\s+obj(.*?)endobj", blob, re.DOTALL)
    }


def _pdf_stream(body: bytes, objs: dict | None = None):
    """Stream bytes of one object. The dict's /Length (direct or, with
    ``objs``, an indirect ``N 0 R``) slices the stream exactly — a binary
    stream containing the byte sequence ``\\r\\nendstream`` is not truncated
    at it; the lazy endstream scan is only the fallback for missing/broken
    /Length. The filter comes from the /Filter VALUE (first name, array
    form included), not a substring match anywhere in the body."""
    import re
    import zlib

    sm = re.search(rb"stream\r?\n", body)
    if sm is None:
        return None
    head, start = body[: sm.start()], sm.end()
    data = None
    length = None
    lm = re.search(rb"/Length\s+(\d+)\s+0\s+R", head)
    if lm and objs is not None:
        ref_body = objs.get(int(lm.group(1)), b"")
        nm = re.search(rb"(\d+)", ref_body)
        if nm:
            length = int(nm.group(1))
    elif not lm:
        lm2 = re.search(rb"/Length\s+(\d+)", head)
        if lm2:
            length = int(lm2.group(1))
    # trust /Length only when the slice lands just before an endstream
    # marker — a wrong length (in-place-edited PDF) would otherwise
    # silently truncate or over-read; fall back to the lazy scan instead
    if length is not None and re.match(rb"\s*endstream", body[start + length :]):
        data = body[start : start + length]
    if data is None:
        m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.DOTALL)
        if m is None:
            return None
        data = m.group(1)
    fm = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", head)
    if fm and fm.group(1) == b"FlateDecode":
        try:
            data = zlib.decompress(data)
        except Exception:
            return None
    return data


def _pdf_literal(s: bytes) -> str:
    out, i = [], 0
    esc = {b"n": "\n", b"r": "\r", b"t": "\t", b"(": "(", b")": ")", b"\\": "\\"}
    while i < len(s):
        c = s[i : i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1 : i + 2]
            out.append(esc.get(nxt, nxt.decode("latin-1")))
            i += 2
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


def _pdf_hex_bytes(s: bytes) -> bytes:
    """Hex-string digits -> raw bytes: whitespace ignored, odd digit count
    padded with a trailing 0 (PDF spec 7.3.4.3)."""
    import re

    digits = re.sub(rb"\s+", b"", s)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _pdf_hex(s: bytes) -> str:
    """Hex string ``<48 65 6C>`` -> text, latin-1 byte decode (the no-CMap
    fallback; CID codes go through the font's ToUnicode CMap instead)."""
    return _pdf_hex_bytes(s).decode("latin-1")


def _parse_cmap(data: bytes):
    """ToUnicode CMap stream -> (code -> unicode str, code byte width).

    Covers the structures real ToUnicode CMaps use (PDF 32000-1:2008 §9.10.3):
    ``begincodespacerange`` (fixes the code width), ``beginbfchar``
    (``<src> <dst>`` pairs) and ``beginbfrange`` (``<lo> <hi> <dstStart>``
    increment form and ``<lo> <hi> [<d1> <d2> ...]`` array form). Dst hex is
    UTF-16BE. Reference scope: PyMuPDF resolves these internally
    (pdf_preprocessing.py:314-400 gets decoded text for free)."""
    import re

    cmap: dict = {}
    width = 0
    for m in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.DOTALL
    ):
        for h in re.finditer(rb"<([0-9A-Fa-f]+)>", m.group(1)):
            width = max(width, (len(h.group(1)) + 1) // 2)

    def _dst(h: bytes) -> str:
        raw = _pdf_hex_bytes(h)
        if len(raw) % 2:  # malformed dst — pad high byte
            raw = b"\x00" + raw
        return raw.decode("utf-16-be", errors="replace")

    hexp = rb"<([0-9A-Fa-f\s]+)>"
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        pairs = re.findall(hexp, m.group(1))
        for src, dst in zip(pairs[0::2], pairs[1::2]):
            sb = _pdf_hex_bytes(src)
            width = max(width, len(sb))
            cmap[int.from_bytes(sb, "big")] = _dst(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        body = m.group(1)
        # array form first: <lo> <hi> [<d1> <d2> ...]
        for rm in re.finditer(
            hexp + rb"\s*" + hexp + rb"\s*\[((?:\s*<[0-9A-Fa-f\s]+>)+)\s*\]",
            body,
        ):
            lo = int.from_bytes(_pdf_hex_bytes(rm.group(1)), "big")
            width = max(width, len(_pdf_hex_bytes(rm.group(1))))
            for off, d in enumerate(re.findall(hexp, rm.group(3))):
                cmap[lo + off] = _dst(d)
        body = re.sub(
            hexp + rb"\s*" + hexp + rb"\s*\[(?:\s*<[0-9A-Fa-f\s]+>)+\s*\]",
            b"", body,
        )
        for rm in re.finditer(hexp + rb"\s*" + hexp + rb"\s*" + hexp, body):
            sb = _pdf_hex_bytes(rm.group(1))
            lo = int.from_bytes(sb, "big")
            hi = int.from_bytes(_pdf_hex_bytes(rm.group(2)), "big")
            width = max(width, len(sb))
            draw = _pdf_hex_bytes(rm.group(3))
            if len(draw) % 2:
                draw = b"\x00" + draw
            dlo = int.from_bytes(draw, "big") if draw else 0
            for off in range(min(hi - lo, 0xFFFF) + 1):
                val = dlo + off
                # widen past the declared dst width when the increment
                # overflows it (malformed-but-seen CMaps) — never raise
                nb = max(len(draw) or 2, ((val.bit_length() + 15) // 16) * 2)
                cmap[lo + off] = val.to_bytes(nb, "big").decode(
                    "utf-16-be", errors="replace"
                )
    return cmap, (width or 1)


def _page_fonts(objs: dict, page_body: bytes, tree_body: bytes = b""):
    """Page dict -> {font resource name: (ToUnicode cmap, code width)}.

    Walks /Resources (inline dict or indirect ref) -> /Font -> per-font
    /ToUnicode stream. PDF resource SHADOWING (7.8.3): a page's own
    /Resources fully replaces the inherited dict, so the page-tree node's
    resources are consulted ONLY when the page has no /Resources entry at
    all — a page font without ToUnicode must keep the latin-1 fallback, not
    pick up a same-named ancestor font's CMap. Fonts without a ToUnicode
    entry are omitted; their strings keep the latin-1 fallback path."""
    import re

    def _resources(body: bytes):
        rm = re.search(rb"/Resources\s+(\d+)\s+0\s+R", body)
        if rm:
            return objs.get(int(rm.group(1)), b"")
        rm = re.search(rb"/Resources\s*<<", body)
        if not rm:
            return None
        # balanced <<...>> slice of JUST the resources dict — an open-ended
        # slice would let the later /Font lookup bind a same-named key
        # elsewhere in the page dict (wrong font -> wrong ToUnicode CMap)
        start, depth, i = rm.end() - 2, 0, rm.end() - 2
        while i < len(body) - 1:
            pair = body[i : i + 2]
            if pair == b"<<":
                depth, i = depth + 1, i + 2
            elif pair == b">>":
                depth, i = depth - 1, i + 2
                if depth == 0:
                    return body[start:i]
            else:
                i += 1
        return body[start:]

    rsrc = _resources(page_body)
    if rsrc is None and tree_body:
        rsrc = _resources(tree_body)
    fonts: dict = {}
    if rsrc is None:
        return fonts
    fm = re.search(rb"/Font\s+(\d+)\s+0\s+R", rsrc)
    fdict = objs.get(int(fm.group(1)), b"") if fm else rsrc
    for em in re.finditer(rb"/(\w+)\s+(\d+)\s+0\s+R", fdict):
        name, oid = em.group(1).decode("latin-1"), int(em.group(2))
        fbody = objs.get(oid, b"")
        if b"/BaseFont" not in fbody and b"/Subtype" not in fbody:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", fbody)
        if tm and name not in fonts:
            data = _pdf_stream(objs.get(int(tm.group(1)), b""), objs)
            if data:
                fonts[name] = _parse_cmap(data)
    return fonts


def _pdf_page_text(content: bytes, fonts: dict | None = None) -> str:
    """Text-showing operators (Tj and TJ arrays, literal AND hex strings)
    -> page text, in true stream order (one sequential scan, tracking the
    current font set by ``Tf``). Hex strings of a font with a ToUnicode CMap
    decode through it (multi-byte CID codes included); 1-byte CMaps apply to
    literal strings too (simple fonts). Everything else falls back to
    latin-1. Encrypted PDFs stay a PyMuPDF seam."""
    import re

    fonts = fonts or {}
    lit = rb"\(((?:\\.|[^\\()])*)\)"
    hexs = rb"<([0-9A-Fa-f\s]*)>"
    item = rb"(?:" + lit + rb"|" + hexs + rb")"
    # the array filler must be DISJOINT from the item alternatives at the
    # first byte ('(' starts only a literal, '<' only a hex string) — an
    # item-or-any-char alternation backtracks EXPONENTIALLY on an
    # unterminated array (e.g. a truncated stream: '[' + 25 strings and no
    # ']' measured seconds-to-hang); with disjoint first bytes the scan is
    # linear and an unterminated item simply ends the array match there
    arr_fill = rb"[^\]()<]"
    tok = re.compile(
        rb"/(\w+)\s+[\d.]+\s+Tf"            # 1: font select
        rb"|" + item + rb"\s*Tj"             # 2/3: literal/hex show
        rb"|\[((?:" + item + rb"|" + arr_fill + rb")*)\]\s*TJ",  # 4: array
        re.DOTALL,
    )
    cur = None  # (cmap, width) of the current font, if it has a CMap

    def _map_hex(h: bytes) -> str:
        if cur is None:
            return _pdf_hex(h)
        cmap, width = cur
        raw = _pdf_hex_bytes(h)
        out = []
        for i in range(0, len(raw) - width + 1, width):
            code = int.from_bytes(raw[i : i + width], "big")
            out.append(cmap.get(code, ""))
        return "".join(out)

    def _map_lit(s: bytes) -> str:
        text = _pdf_literal(s)
        if cur is None or cur[1] != 1:
            return text
        cmap = cur[0]
        return "".join(cmap.get(ord(c), c) for c in text)

    parts = []
    for m in tok.finditer(content):
        if m.group(1) is not None:
            f = m.group(1).decode("latin-1")
            cur = fonts.get(f)
        elif m.group(2) is not None:
            parts.append(_map_lit(m.group(2)))
        elif m.group(3) is not None:
            parts.append(_map_hex(m.group(3)))
        elif m.group(4) is not None:
            for x in re.finditer(item, m.group(4)):
                parts.append(
                    _map_lit(x.group(1)) if x.group(1) is not None
                    else _map_hex(x.group(2))
                )
    return " ".join(p.strip() for p in parts if p.strip())


def _parse_pdf_bytes(name: str, blob: bytes):
    """One simple PDF -> (full_text, rows, media) where rows are
    (pord, sord, kind, text, media_ref) and media is
    [(media_ref, mime, bytes)]. Page order follows the /Pages /Kids array
    (reference walks doc.pages, pdf_preprocessing.py:314-400); per page: one
    text span, then the page's /XObject images in dictionary order."""
    import re

    objs = _pdf_objects(blob)
    # page order: /Kids of the page-tree node; fallback = object-id order
    page_ids, tree_body = [], b""
    for body in objs.values():
        if b"/Kids" in body and b"/Page" in body:
            m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.DOTALL)
            if m:
                tree_body = body
                page_ids = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", m.group(1))]
                break
    if not page_ids:
        page_ids = sorted(
            oid
            for oid, body in objs.items()
            if re.search(rb"/Type\s*/Page\b", body) and b"/Kids" not in body
        )
    rows, texts, media = [], [], []
    for pord, pid in enumerate(page_ids):
        body = objs.get(pid, b"")
        text = ""
        mc = re.search(rb"/Contents\s+(\d+)\s+0\s+R", body)
        if mc and int(mc.group(1)) in objs:
            content = _pdf_stream(objs[int(mc.group(1))], objs)
            if content:
                try:
                    fonts = _page_fonts(objs, body, tree_body)
                except Exception:
                    fonts = {}  # malformed font dicts degrade to latin-1
                text = _pdf_page_text(content, fonts)
        texts.append(text)
        sord = 0
        if text.strip():
            rows.append((pord, sord, "text", text.strip(), ""))
            sord += 1
        for mx in re.finditer(rb"/XObject\s*<<(.*?)>>", body, re.DOTALL):
            for ref in re.finditer(rb"/\w+\s+(\d+)\s+0\s+R", mx.group(1)):
                xid = int(ref.group(1))
                xbody = objs.get(xid, b"")
                if not re.search(rb"/Subtype\s*/Image\b", xbody):
                    continue
                media_ref = f"pdf://{name}/obj{xid}"
                mime = (
                    "image/jpeg" if b"/DCTDecode" in xbody
                    else "application/octet-stream"
                )
                data = _pdf_stream(xbody, objs) or b""
                rows.append((pord, sord, "image", "", media_ref))
                media.append((media_ref, mime, data))
                sord += 1
    return "\n".join(texts), rows, media


def read_pdf_dir(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Directory of simple PDFs -> documents(doc_id, spans).

    Stdlib-only mini-parser (zlib FlateDecode + literal/hex text-string
    operators): real text/image extraction for straightforward generators.
    Complex PDFs (CID fonts, object streams, encryption) need the PyMuPDF
    front-end the reference uses (pdf_preprocessing.py:314-400) — it emits
    the same span shape, so it plugs in at this seam. doc_id = "doc-" +
    md5(full text + ordered media refs) — see _doc_id; media refs embed the
    path, so cross-path dedup applies only to text-only files."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def run(batches):
        import hashlib
        import os

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "pord", "sord", "kind", "text", "media_ref")}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                name = _file_key(fpath)
                full_text, rows, _ = _parse_pdf_bytes(name, bytes(blob))
                did = _doc_id(full_text, rows)
                for pord, sord, kind, text, ref in rows:
                    out["doc_id"].append(did)
                    out["pord"].append(pord)
                    out["sord"].append(sord)
                    out["kind"].append(kind)
                    out["text"].append(text)
                    out["media_ref"].append(ref)
            yield pd.DataFrame(out)

    flat = raw.mapInPandas(
        run,
        "doc_id string, pord int, sord int, kind string, text string, media_ref string",
    )
    return _collect_documents(flat)


def read_pdf_media(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Directory of simple PDFs -> (media_ref, mime, content) binary table;
    DCTDecode streams are raw JPEG bytes. Refs match read_pdf_dir's spans."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def run(batches):
        import os

        import pandas as pd

        for pdf in batches:
            refs, mimes, blobs = [], [], []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                _, _, media = _parse_pdf_bytes(_file_key(fpath), bytes(blob))
                for ref, mime, data in media:
                    refs.append(ref)
                    mimes.append(mime)
                    blobs.append(data)
            yield pd.DataFrame({"media_ref": refs, "mime": mimes, "content": blobs})

    return raw.mapInPandas(run, "media_ref string, mime string, content binary")


def read_docx_media(spark: SparkSession, path: str, glob: str = "*.docx") -> DataFrame:
    """Directory of .docx files -> (media_ref, mime, content) binary table —
    the S7 media-bytes side of the DOCX walk (the reference extracts blobs via
    doc.part.rels[embed].target_part.blob; here: the zip's word/media parts).
    media_ref matches read_docx_dir's image spans, so the two tables join."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    mimes = {
        "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
        "gif": "image/gif", "bmp": "image/bmp", "emf": "image/emf",
    }

    def run(batches):
        import io
        import os
        import zipfile

        import pandas as pd

        for pdf in batches:
            refs, mime_l, blobs = [], [], []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                name = _file_key(fpath)
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as z:
                    for info in z.infolist():
                        if not info.filename.startswith("word/media/"):
                            continue
                        target = info.filename[len("word/") :]
                        ext = target.rsplit(".", 1)[-1].lower()
                        refs.append(f"docx://{name}/{target}")
                        mime_l.append(mimes.get(ext, "application/octet-stream"))
                        blobs.append(z.read(info))
            yield pd.DataFrame({"media_ref": refs, "mime": mime_l, "content": blobs})

    return raw.mapInPandas(run, "media_ref string, mime string, content binary")
