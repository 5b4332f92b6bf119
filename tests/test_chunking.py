"""Chunker: title hierarchy, budgets, overlap, small-chunk merge."""

from super_rag_tpu.chunk.chunking import Rechunker, approx_token_count, rechunk
from super_rag_tpu.fileparser.base import CodePart, TextPart, TitlePart
from super_rag_tpu.fileparser.markdown import MarkdownParser


def test_title_hierarchy_paths():
    parts = [
        TitlePart(content="Guide", level=1),
        TitlePart(content="Install", level=2),
        TextPart(content="pip install example"),
        TitlePart(content="Usage", level=2),
        TextPart(content="run the example binary"),
        TitlePart(content="Advanced", level=1),
        TextPart(content="advanced content here"),
    ]
    chunks = rechunk(parts, chunk_size=50)
    paths = [c.title_path for c in chunks]
    assert ("Guide", "Install") in paths
    assert ("Guide", "Usage") in paths
    assert ("Advanced",) in paths
    # level-1 title pops the whole stack
    assert all(p[0] == "Advanced" for p in paths if "advanced" in " ".join(p).lower())


def test_budget_respected():
    long_text = " ".join(f"word{i}" for i in range(3000))
    chunks = rechunk([TextPart(content=long_text)], chunk_size=100, chunk_overlap=10)
    assert len(chunks) > 10
    for c in chunks:
        assert approx_token_count(c.text) <= 130  # budget + overlap slack


def test_overlap_carries_tail():
    long_text = " ".join(f"w{i}" for i in range(500))
    chunks = rechunk([TextPart(content=long_text)], chunk_size=50, chunk_overlap=10)
    for prev, cur in zip(chunks, chunks[1:]):
        if prev.title_path != cur.title_path:
            continue
        prev_words = prev.text.split()
        assert cur.text.split()[0] in prev_words[-15:]


def test_small_chunks_merge():
    parts = [
        TitlePart(content="T", level=1),
        TextPart(content="short one"),
        TextPart(content="short two"),
        TextPart(content="short three"),
    ]
    chunks = rechunk(parts, chunk_size=400)
    assert len(chunks) == 1
    assert "short one" in chunks[0].text and "short three" in chunks[0].text


def test_cjk_sentences_split():
    text = "这是第一句话。这是第二句话。" * 120
    chunks = rechunk([TextPart(content=text)], chunk_size=100, chunk_overlap=0)
    assert len(chunks) >= 2
    for c in chunks:
        assert approx_token_count(c.text) <= 120


def test_code_blocks_preserved():
    parts = [
        TitlePart(content="Code", level=1),
        CodePart(content="def f():\n    return 1\n", language="python"),
    ]
    chunks = rechunk(parts, chunk_size=400)
    assert "```python" in chunks[0].text
    assert "def f():" in chunks[0].text


def test_padded_text_includes_titles():
    parts = [
        TitlePart(content="API", level=1),
        TitlePart(content="Auth", level=2),
        TextPart(content="use bearer tokens"),
    ]
    c = rechunk(parts)[0]
    assert c.padded_text.startswith("API > Auth\n")
    assert c.metadata["title_path"] == "API > Auth"


def test_end_to_end_markdown():
    md = """# Title

Intro paragraph.

## Section A

Content of section A with several words.

```python
print("hi")
```

## Section B

| col1 | col2 |
|------|------|
| a    | b    |

Final text.
"""
    parts = MarkdownParser().parse_text(md)
    chunks = rechunk(parts, chunk_size=400)
    joined = "\n".join(c.text for c in chunks)
    assert "Intro paragraph" in joined
    assert 'print("hi")' in joined
    assert any(c.title_path == ("Title", "Section A") for c in chunks)


def test_data_uri_extraction():
    import base64

    png = base64.b64encode(b"\x89PNG fake image data").decode()
    md = f"# Img\n\n![alt](data:image/png;base64,{png})\n\ntext after"
    parts = MarkdownParser().parse_text(md)
    kinds = [type(p).__name__ for p in parts]
    assert "AssetBinPart" in kinds
    assert "ImagePart" in kinds
