"""Office OOXML parsers (docx/xlsx/pptx built as zip+XML in-test)."""

import io
import zipfile

from super_rag_tpu.fileparser.parser import DocParser

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def zip_bytes(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in files.items():
            z.writestr(name, content)
    return buf.getvalue()


def test_docx():
    doc = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>
    <w:r><w:t>Quarterly Report</w:t></w:r></w:p>
  <w:p><w:r><w:t>Revenue grew by </w:t></w:r><w:r><w:t>12 percent.</w:t></w:r></w:p>
</w:body></w:document>"""
    data = zip_bytes({"word/document.xml": doc})
    parts = DocParser().parse_file("r.docx", data)
    assert parts[0].content == "Quarterly Report" and parts[0].level == 1
    assert "Revenue grew by 12 percent." in parts[1].content


def test_xlsx():
    shared = f"""<?xml version="1.0"?>
<sst xmlns="{S}"><si><t>alpha</t></si><si><t>beta</t></si></sst>"""
    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{S}"><sheetData>
  <row><c t="s"><v>0</v></c><c><v>42</v></c></row>
  <row><c t="s"><v>1</v></c></row>
</sheetData></worksheet>"""
    data = zip_bytes({"xl/sharedStrings.xml": shared,
                      "xl/worksheets/sheet1.xml": sheet})
    parts = DocParser().parse_file("t.xlsx", data)
    text = "\n".join(p.content for p in parts)
    # sheets keep their grid: markdown table, ragged rows padded
    assert "| alpha | 42 |" in text, text
    assert "| --- | --- |" in text
    assert "| beta |  |" in text


def test_docx_table_keeps_grid():
    doc = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
  <w:p><w:r><w:t>Before table.</w:t></w:r></w:p>
  <w:tbl>
    <w:tr><w:tc><w:p><w:r><w:t>Name</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>Role</w:t></w:r></w:p></w:tc></w:tr>
    <w:tr><w:tc><w:p><w:r><w:t>Alice</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>Eng|ineer</w:t></w:r></w:p></w:tc></w:tr>
  </w:tbl>
  <w:p><w:r><w:t>After table.</w:t></w:r></w:p>
</w:body></w:document>"""
    data = zip_bytes({"word/document.xml": doc})
    parts = DocParser().parse_file("t.docx", data)
    text = "\n".join(p.content for p in parts)
    assert text.index("Before table.") < text.index("| Name | Role |")
    assert "| Alice | Eng\\|ineer |" in text  # pipes escaped
    assert text.index("| Alice") < text.index("After table.")
    # cell paragraphs are NOT duplicated as free-floating text
    assert text.count("Alice") == 1


def test_docx_sdt_content_controls():
    """Paragraphs nested in w:sdt (TOCs, cover pages, form fields) must
    not vanish — Word wraps whole sections in content controls."""
    doc = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
  <w:p><w:r><w:t>plain paragraph</w:t></w:r></w:p>
  <w:sdt><w:sdtContent>
    <w:p><w:r><w:t>inside content control</w:t></w:r></w:p>
    <w:tbl><w:tr><w:tc><w:p><w:r><w:t>CellA</w:t></w:r></w:p></w:tc>
                 <w:tc><w:p><w:r><w:t>CellB</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
  </w:sdtContent></w:sdt>
  <w:p><w:r><w:t>after control</w:t></w:r></w:p>
</w:body></w:document>"""
    data = zip_bytes({"word/document.xml": doc})
    parts = DocParser().parse_file("sdt.docx", data)
    text = "\n".join(p.content for p in parts)
    assert "inside content control" in text
    assert "| CellA | CellB |" in text
    assert text.index("plain paragraph") < text.index("inside content control")
    assert text.index("| CellA") < text.index("after control")
    assert text.count("CellA") == 1  # table cells not re-emitted as text


def test_xlsx_sparse_rows_align_columns():
    """Sparse rows omit empty <c> elements; the r= reference must place
    values in their true columns or the grid lies about structure."""
    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{S}"><sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>Name</t></is></c>
             <c r="B1" t="inlineStr"><is><t>Qty</t></is></c></row>
  <row r="2"><c r="B2"><v>5</v></c></row>
  <row r="3"><c r="A3" t="inlineStr"><is><t>bolt</t></is></c>
             <c r="C3"><v>7</v></c></row>
</sheetData></worksheet>"""
    data = zip_bytes({"xl/worksheets/sheet1.xml": sheet})
    parts = DocParser().parse_file("sparse.xlsx", data)
    text = "\n".join(p.content for p in parts)
    assert "| Name | Qty |" in text, text
    assert "|  | 5 |" in text, text           # Qty=5 stays under Qty
    assert "| bolt |  | 7 |" in text, text    # interior gap preserved


def test_pptx():
    slide = f"""<?xml version="1.0"?>
<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
       xmlns:a="{A}">
  <p:cSld><a:t>Launch Plan</a:t><a:t>Ship in Q3</a:t></p:cSld></p:sld>"""
    data = zip_bytes({"ppt/slides/slide1.xml": slide})
    parts = DocParser().parse_file("deck.pptx", data)
    assert "Launch Plan" in parts[0].content
    assert "Ship in Q3" in parts[1].content


def test_end_to_end_docx_ingest(tmp_path):
    from super_rag_tpu.config import Settings
    from super_rag_tpu.service.collection_service import CollectionService
    from super_rag_tpu.service.document_service import DocumentService
    from super_rag_tpu.service.context import build_context

    doc = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
  <w:p><w:r><w:t>Wolverines are tenacious mustelids.</w:t></w:r></w:p>
</w:body></w:document>"""
    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    cs = CollectionService(ctx)
    ds = DocumentService(ctx, cs)
    coll = cs.create("u", "office")
    d = ds.create("u", coll["id"], "animals.docx",
                  zip_bytes({"word/document.xml": doc}))
    assert d["status"] == "COMPLETE"
    eng = ctx.engines.get(coll["id"], coll["config"])
    hits = eng.search("tenacious mustelids", top_k=1, mode="fulltext")
    assert hits and "Wolverines" in hits[0].text
