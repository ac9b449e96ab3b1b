"""Markdown ingestion -> interleaved documents table (S1-S3 equivalent)."""

from __future__ import annotations

import os

from mmgraphrag_spark.sources.ingest import markdown_to_documents, read_markdown_dir


MD = """Intro paragraph about things.

![figure one](img://a/0)

Second paragraph with an inline ![inline cap](img://a/1) image tag.

Final text."""


def test_markdown_to_documents(spark):
    raw = spark.createDataFrame([("f.md", MD)], ["file", "text"])
    docs = markdown_to_documents(raw).collect()
    assert len(docs) == 1
    spans = docs[0].spans
    seq = [(s.kind, s.media_ref, s.offset) for s in spans]
    assert [o for (_, _, o) in seq] == list(range(len(spans)))
    kinds = [k for (k, _, _) in seq]
    assert kinds == ["text", "image", "text", "image", "text"]
    # pure-image paragraph keeps its caption; inline tag is scrubbed from text
    assert spans[1].text == "figure one"
    assert spans[1].media_ref == "img://a/0"
    assert "![inline" not in spans[2].text
    assert spans[3].media_ref == "img://a/1"
    assert docs[0].doc_id.startswith("doc-")


def test_read_markdown_dir_feeds_pipeline(spark, tmp_path):
    p = tmp_path / "corpus"
    os.makedirs(p)
    (p / "a.md").write_text(
        "ENTITY_1 is a PERSON associated with topic_0.\n\n"
        "![Figure: ENTITY_1.](img://a/0)\n\n"
        "ENTITY_1 RELATES_TO ENTITY_2 (w=3) regarding topic_0."
    )
    docs = read_markdown_dir(spark, str(p))
    from mmgraphrag_spark.pipeline import run_pipeline

    out = run_pipeline(spark, docs)
    triples = {(r.subj, r.obj) for r in out["triples"].collect()}
    assert ('"ENTITY_1"', '"ENTITY_2"') in triples
    # image aligned and contained
    assert any(s.startswith('"IMG_') or o.startswith('"IMG_') for s, o in triples)


# -- DOCX front-end (S1) ------------------------------------------------------

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_R = "http://schemas.openxmlformats.org/package/2006/relationships"

_DOC_XML = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="{_W}" xmlns:a="{_A}" xmlns:r="{_R}">
  <w:body>
    <w:p><w:r><w:t>First paragraph about </w:t></w:r><w:r><w:t>ENTITY_1.</w:t></w:r></w:p>
    <w:p>
      <w:r><w:t>Second paragraph with a figure.</w:t></w:r>
      <w:r><w:drawing><a:blip r:embed="rId5"/></w:drawing></w:r>
    </w:p>
    <w:p><w:r><w:drawing><a:blip r:embed="rId6"/></w:drawing></w:r></w:p>
    <w:p><w:r><w:t>   </w:t></w:r></w:p>
    <w:p><w:r><w:t>Closing text.</w:t></w:r></w:p>
  </w:body>
</w:document>"""

_RELS_XML = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_PKG_R}">
  <Relationship Id="rId5" Type="{_R}/image" Target="media/image1.png"/>
  <Relationship Id="rId6" Type="{_R}/image" Target="media/image2.jpeg"/>
</Relationships>"""

_PNG_BYTES = b"\x89PNG\r\n\x1a\nfakepng"
_JPG_BYTES = b"\xff\xd8\xfffakejpg"


def _write_docx(path):
    import zipfile

    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", _DOC_XML)
        z.writestr("word/_rels/document.xml.rels", _RELS_XML)
        z.writestr("word/media/image1.png", _PNG_BYTES)
        z.writestr("word/media/image2.jpeg", _JPG_BYTES)


def test_read_docx_dir_interleaved_spans(spark, tmp_path):
    """DOCX walk emits the same interleaved span sequence shape as markdown:
    per-paragraph text spans and in-order a:blip image spans with resolved
    media targets; whitespace-only paragraphs are dropped."""
    from mmgraphrag_spark.sources.ingest import read_docx_dir

    d = tmp_path / "docs"
    os.makedirs(d)
    _write_docx(str(d / "report.docx"))
    docs = read_docx_dir(spark, str(d)).collect()
    key = str(d / "report.docx").lstrip("/")
    assert len(docs) == 1
    spans = docs[0].spans
    seq = [(s.kind, s.text, s.media_ref, s.offset) for s in spans]
    assert [o for (_, _, _, o) in seq] == list(range(len(spans)))
    assert [k for (k, _, _, _) in seq] == ["text", "text", "image", "image", "text"]
    # run-split paragraph text is concatenated like python-docx para.text
    assert spans[0].text == "First paragraph about ENTITY_1."
    assert spans[2].media_ref == f"docx://{key}/media/image1.png"
    assert spans[3].media_ref == f"docx://{key}/media/image2.jpeg"
    assert docs[0].doc_id.startswith("doc-")


def test_read_docx_media_joins_spans(spark, tmp_path):
    """The media-bytes table's refs match the span refs (S7 join key) and the
    blobs round-trip."""
    from mmgraphrag_spark.sources.ingest import read_docx_dir, read_docx_media

    d = tmp_path / "docs"
    os.makedirs(d)
    _write_docx(str(d / "report.docx"))
    key = str(d / "report.docx").lstrip("/")
    media = {r.media_ref: (r.mime, bytes(r.content)) for r in read_docx_media(spark, str(d)).collect()}
    assert media[f"docx://{key}/media/image1.png"] == ("image/png", _PNG_BYTES)
    assert media[f"docx://{key}/media/image2.jpeg"] == ("image/jpeg", _JPG_BYTES)
    span_refs = {
        s.media_ref
        for r in read_docx_dir(spark, str(d)).collect()
        for s in r.spans
        if s.kind == "image"
    }
    assert span_refs == set(media)


def test_docx_feeds_pipeline(spark, tmp_path):
    """End-to-end: a DOCX document flows through the full KG pipeline."""
    from mmgraphrag_spark.pipeline import run_pipeline
    from mmgraphrag_spark.sources.ingest import read_docx_dir

    d = tmp_path / "docs"
    os.makedirs(d)
    _write_docx(str(d / "report.docx"))
    docs = read_docx_dir(spark, str(d))
    out = run_pipeline(spark, docs)
    assert out["chunks"].count() >= 1
    assert out["media_spans"].count() == 2  # both blips associated to chunks


# -- PDF front-end (S2) -------------------------------------------------------

def _write_pdf(path):
    """Handcrafted minimal PDF: 2 pages in /Kids order, literal-string Tj and
    TJ-array text, one DCTDecode image XObject on page 1."""
    jpg = b"\xff\xd8\xfffakejpg"
    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /XObject << /Im1 7 0 R >> >> >> endobj\n",
        b"4 0 obj << /Length 48 >> stream\n"
        b"BT /F1 12 Tf (First page about ENTITY_1.) Tj ET\nendstream endobj\n",
        b"5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n",
        b"6 0 obj << /Length 38 >> stream\n"
        b"BT [(Second) -250 (page text.)] TJ ET\nendstream endobj\n",
        b"7 0 obj << /Subtype /Image /Filter /DCTDecode /Width 1 /Height 1 "
        b"/Length 10 >> stream\n" + jpg + b"\nendstream endobj\n",
        b"%%EOF\n",
    ]
    with open(path, "wb") as f:
        f.write(b"".join(parts))
    return jpg


def test_read_pdf_dir_interleaved_spans(spark, tmp_path):
    from mmgraphrag_spark.sources.ingest import read_pdf_dir

    d = tmp_path / "pdfs"
    os.makedirs(d)
    _write_pdf(str(d / "paper.pdf"))
    docs = read_pdf_dir(spark, str(d)).collect()
    key = str(d / "paper.pdf").lstrip("/")
    assert len(docs) == 1
    spans = docs[0].spans
    seq = [(s.kind, s.text, s.media_ref) for s in spans]
    assert seq == [
        ("text", "First page about ENTITY_1.", ""),
        ("image", "", f"pdf://{key}/obj7"),
        ("text", "Second page text.", ""),
    ]
    assert [s.offset for s in spans] == [0, 1, 2]


def _write_hex_pdf(path):
    """One-page PDF exercising the round-3 parser upgrades: hex-string Tj
    (with internal whitespace), a TJ array mixing literal and hex items, a
    literal string containing '/FlateDecode' (must NOT trigger decompression
    — the filter is parsed from the dict, not substring-matched), and an
    image stream with an indirect /Length whose payload embeds the byte
    sequence '\\r\\nendstream' (only exact /Length slicing keeps it whole)."""
    content = (
        b"BT <4865 7820 70 61 67 652E> Tj "
        b"[( and ) <686578> ( items.)] TJ "
        b"(/FlateDecode mention) Tj ET"
    )
    jpg = b"\xff\xd8\xffAA\r\nendstream BB"
    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /XObject << /Im1 8 0 R >> >> >> endobj\n",
        b"4 0 obj << /Length %d >> stream\n" % len(content)
        + content
        + b"\nendstream endobj\n",
        b"8 0 obj << /Subtype /Image /Filter /DCTDecode /Width 1 /Height 1 "
        b"/Length 9 0 R >> stream\n" + jpg + b"\nendstream endobj\n",
        b"9 0 obj %d endobj\n" % len(jpg),
        b"%%EOF\n",
    ]
    with open(path, "wb") as f:
        f.write(b"".join(parts))
    return jpg


def test_pdf_hex_text_and_exact_stream_slicing(tmp_path):
    from mmgraphrag_spark.sources.ingest import _parse_pdf_bytes, _pdf_hex

    assert _pdf_hex(b"48 65 6C6C 6F") == "Hello"
    assert _pdf_hex(b"486") == "H`"  # odd digit count pads a trailing 0

    p = str(tmp_path / "hex.pdf")
    jpg = _write_hex_pdf(p)
    with open(p, "rb") as f:
        full_text, rows, media = _parse_pdf_bytes("hex.pdf", f.read())
    # True stream order: the single sequential scan interleaves Tj and
    # TJ-array items exactly as the content stream shows them (PyMuPDF
    # parity; the old two-pass scan emitted all Tj first).
    assert full_text.strip() == "Hex page. and hex items. /FlateDecode mention"
    # The indirect /Length sliced the image exactly: the embedded
    # "\r\nendstream" bytes did not truncate it.
    assert media == [("pdf://hex.pdf/obj8", "image/jpeg", jpg)]


def _write_cid_pdf(path):
    """One-page PDF with CID-keyed text: a Type0 font whose 2-byte hex codes
    only decode through its /ToUnicode CMap (bfchar, increment bfrange AND
    array bfrange), a simple font with a 1-byte CMap that remaps literal
    strings, and a CMap-less font falling back to latin-1."""
    cmap1 = (
        b"/CIDInit /ProcSet findresource begin begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"4 beginbfchar\n<0041> <0048>\n<0042> <0065>\n<0043> <006F>\n"
        b"<0044> <0064>\nendbfchar\n"
        b"1 beginbfrange\n<0050> <0052> <006C>\nendbfrange\n"
        b"1 beginbfrange\n<0060> <0061> [<0057006F> <0072>]\nendbfrange\n"
        b"endcmap end\n"
    )
    cmap2 = (
        b"begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<58> <0021>\nendbfchar\nendcmap\n"
    )
    content = (
        b"BT /F1 12 Tf <0041 0042 0050 0050 0043> Tj\n"
        b"[<00600061 0050 0044>] TJ\n"
        b"/F2 10 Tf (X) Tj\n"
        b"/F3 10 Tf (plain) Tj ET"
    )
    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R /F2 10 0 R /F3 12 0 R >> >> "
        b">> endobj\n",
        b"4 0 obj << /Length %d >> stream\n" % len(content)
        + content + b"\nendstream endobj\n",
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-CID "
        b"/ToUnicode 6 0 R >> endobj\n",
        b"6 0 obj << /Length %d >> stream\n" % len(cmap1)
        + cmap1 + b"\nendstream endobj\n",
        b"10 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Fake-Simple "
        b"/ToUnicode 11 0 R >> endobj\n",
        b"11 0 obj << /Length %d >> stream\n" % len(cmap2)
        + cmap2 + b"\nendstream endobj\n",
        b"12 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Fake-Plain "
        b">> endobj\n",
        b"%%EOF\n",
    ]
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def test_pdf_cid_tounicode_cmap(tmp_path):
    from mmgraphrag_spark.sources.ingest import _parse_cmap, _parse_pdf_bytes

    # unit: the three CMap section forms
    cmap, width = _parse_cmap(
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0041> <0048> endbfchar\n"
        b"1 beginbfrange <0050> <0052> <006C> endbfrange\n"
        b"1 beginbfrange <0060> <0061> [<0057006F> <0072>] endbfrange\n"
    )
    assert width == 2
    assert cmap[0x41] == "H"
    assert [cmap[c] for c in (0x50, 0x51, 0x52)] == ["l", "m", "n"]
    assert cmap[0x60] == "Wo" and cmap[0x61] == "r"

    # malformed bfrange whose increment overflows the declared dst width
    # must degrade, not raise (one adversarial PDF must not kill the task)
    cmap2, _ = _parse_cmap(
        b"1 beginbfrange <0000> <0001> <FFFF> endbfrange\n"
    )
    assert cmap2[0] == "\uffff" and len(cmap2) == 2  # 0x10000 widened, no crash

    p = str(tmp_path / "cid.pdf")
    _write_cid_pdf(p)
    with open(p, "rb") as f:
        full_text, rows, media = _parse_pdf_bytes("cid.pdf", f.read())
    # F1: CID hex codes through the CMap (Tj AND TJ-array, incl. the
    # multi-char "Wo" array dst); F2: 1-byte CMap remaps the literal 'X';
    # F3: no CMap -> latin-1 fallback.
    assert full_text.strip() == "Hello World ! plain"


def test_read_pdf_media_extracts_jpeg(spark, tmp_path):
    from mmgraphrag_spark.sources.ingest import read_pdf_media

    d = tmp_path / "pdfs"
    os.makedirs(d)
    jpg = _write_pdf(str(d / "paper.pdf"))
    rows = read_pdf_media(spark, str(d)).collect()
    key = str(d / "paper.pdf").lstrip("/")
    assert len(rows) == 1
    assert rows[0].media_ref == f"pdf://{key}/obj7"
    assert rows[0].mime == "image/jpeg"
    assert bytes(rows[0].content) == jpg


def test_identical_files_collapse_to_one_clean_doc(spark, tmp_path):
    """Two byte-identical files share a doc_id AND their span rows dedupe —
    the result is ONE document with correct offsets, not a doubled one."""
    from mmgraphrag_spark.sources.ingest import read_markdown_dir

    d = tmp_path / "dup"
    os.makedirs(d)
    text = "Alpha paragraph.\n\n![fig](img://x/0)\n\nOmega paragraph."
    (d / "a.md").write_text(text)
    (d / "b.md").write_text(text)
    docs = read_markdown_dir(spark, str(d)).collect()
    assert len(docs) == 1
    spans = docs[0].spans
    assert [s.offset for s in spans] == [0, 1, 2]
    assert [s.kind for s in spans] == ["text", "image", "text"]


def test_chunk_overlap_must_be_smaller_than_window(spark):
    import pytest as _pytest

    from mmgraphrag_spark.operators.spans import chunk_occurrences
    from mmgraphrag_spark.backends.tokenizer import RegexTokenizerBackend

    spans = spark.createDataFrame(
        [("d1", 0, "text", "some words here", "", 0)],
        ["doc_id", "span_pos", "kind", "text", "media_ref", "offset"],
    )
    with _pytest.raises(ValueError):
        chunk_occurrences(spans, max_tokens=100, overlap=100)
    with _pytest.raises(ValueError):
        chunk_occurrences(
            spans, max_tokens=100, overlap=150, tokenizer=RegexTokenizerBackend()
        )


def test_pdf_page_text_linear_on_unterminated_array():
    """The TJ-array tokenizer must stay linear on malformed input: an
    unterminated array ('[' + many strings, no ']') made an earlier
    item-or-any-char alternation backtrack exponentially (seconds at 24
    items, effectively hanging an executor past ~30). The disjoint-first-byte
    filler makes the scan linear; the malformed array extracts nothing and
    the rest of the stream still parses."""
    import time

    from mmgraphrag_spark.sources.ingest import _pdf_page_text

    content = b"[" + b"(word) " * 60 + b"(truncated"
    t0 = time.monotonic()
    assert _pdf_page_text(content) == ""
    assert time.monotonic() - t0 < 1.0
    # a well-formed tail after a malformed array is still reached
    assert "after" in _pdf_page_text(content + b"\n(after) Tj")


def test_pdf_stream_length_mismatch_falls_back():
    """A direct /Length is trusted only when its slice lands just before an
    endstream marker; a wrong length (in-place-edited PDF) falls back to
    the lazy endstream scan instead of silently truncating/over-reading."""
    from mmgraphrag_spark.sources.ingest import _pdf_stream

    content = b"BT (some long page text that length 10 would cut) Tj ET"
    short = b"<< /Length 10 >> stream\n" + content + b"\nendstream"
    assert _pdf_stream(short) == content
    exact = (b"<< /Length %d >> stream\n" % len(content)) + content + b"\nendstream"
    assert _pdf_stream(exact) == content
    long = b"<< /Length 999 >> stream\n" + content + b"\nendstream\n9 0 obj"
    assert _pdf_stream(long) == content


def test_page_fonts_resources_dict_bounded():
    """An inline /Resources dict is sliced with balanced <<>> matching: a
    /Font key elsewhere in the page dict (outside /Resources) must NOT be
    consulted, and a /Font nested inside /Resources still resolves."""
    from mmgraphrag_spark.sources.ingest import _page_fonts

    cmap = (
        b"begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<58> <0021>\nendbfchar\nendcmap\n"
    )
    objs = {
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Good /ToUnicode 6 0 R >>",
        6: (b"<< /Length %d >> stream\n" % len(cmap)) + cmap + b"\nendstream",
        8: b"<< /Decoy /Font << /F1 5 0 R >> >>",
    }
    # page-level /Font OUTSIDE the (empty-ish) resources dict: must be ignored
    page = b"<< /Resources << /ProcSet [/PDF] >> /Annots [1 0 R] /Font 8 0 R >>"
    assert _page_fonts(objs, page) == {}
    # /Font nested inside /Resources still resolves through its ToUnicode
    page2 = b"<< /Resources << /Font << /F1 5 0 R >> >> /Font 8 0 R >>"
    fonts = _page_fonts(objs, page2)
    assert set(fonts) == {"F1"}
    cm, width = fonts["F1"]
    assert width == 1 and cm[0x58] == "!"
