"""Sources, archives, migrations, chat titles, vision index."""

import io
import tarfile
import zipfile

import pytest

from super_rag_tpu.store.db import Database
from super_rag_tpu.store.sources import LocalDirectorySource, get_source
from super_rag_tpu.utils.uncompress import iter_archive, supported_archive


def test_local_directory_source(tmp_path):
    (tmp_path / "a.md").write_text("# A")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_text("b")
    (tmp_path / "skip.bin").write_bytes(b"\x00" * 10)
    src = LocalDirectorySource(str(tmp_path), extensions={".md", ".txt"})
    docs = list(src.scan())
    assert {d.name for d in docs} == {"a.md", "sub/b.txt"}
    assert docs[0].read(src)
    with pytest.raises(ValueError):
        src.fetch("/etc/passwd")


def test_source_factory(tmp_path):
    src = get_source("local", root=str(tmp_path))
    assert isinstance(src, LocalDirectorySource)
    with pytest.raises(ValueError):
        get_source("carrier-pigeon")


def test_zip_extraction():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("doc1.md", "# One")
        z.writestr("dir/doc2.txt", "two")
        z.writestr("../evil.txt", "nope")
    members = dict(iter_archive("bundle.zip", buf.getvalue()))
    assert set(members) == {"doc1.md", "dir/doc2.txt"}
    assert members["doc1.md"] == b"# One"
    assert supported_archive("x.tar.gz") and not supported_archive("x.md")


def test_tar_extraction():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as t:
        data = b"content"
        info = tarfile.TarInfo("inner/doc.md")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    members = dict(iter_archive("b.tar.gz", buf.getvalue()))
    assert members == {"inner/doc.md": b"content"}


def test_unsupported_archive():
    with pytest.raises(ValueError, match="proprietary codecs"):
        list(iter_archive("x.rar", b""))


def test_migrations_applied_and_idempotent(tmp_path):
    db = Database(str(tmp_path / "m.db"))
    providers = {p["name"] for p in db.list_providers()}
    assert {"openai", "anthropic", "local"} <= providers
    v = db.query_one("SELECT MAX(version) AS v FROM schema_version")["v"]
    assert v >= 2
    # reopening does not re-run
    db2 = Database(str(tmp_path / "m.db"))
    assert len(db2.query("SELECT * FROM schema_version")) == v


def test_chat_title_generation(tmp_path):
    import asyncio

    from super_rag_tpu.config import Settings
    from super_rag_tpu.service.chat_service import ChatService
    from super_rag_tpu.service.collection_service import CollectionService
    from super_rag_tpu.service.context import build_context

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=32,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    chats = ChatService(ctx, CollectionService(ctx))
    chat = chats.create("u")
    assert not chat["title"]

    async def drive():
        async for _ in chats.process_message(
            "u", chat["id"], "what is the meaning of systolic arrays"
        ):
            pass

    asyncio.new_event_loop().run_until_complete(drive())
    assert ctx.db.get_chat(chat["id"])["title"].startswith("what is the")


def test_vision_rows_offline():
    from super_rag_tpu.fileparser.base import AssetBinPart, ImagePart, TextPart
    from super_rag_tpu.index.vision import vision_rows

    parts = [
        TextPart(content="intro"),
        ImagePart(url="asset://abc123", content="architecture diagram"),
        AssetBinPart(data=b"png", asset_id="abc123", mime_type="image/png"),
    ]
    rows = vision_rows(parts, doc_name="paper.md")
    assert len(rows) == 1
    assert "architecture diagram" in rows[0]["text"]
    assert rows[0]["asset_id"] == "abc123"


def test_vision_rows_with_captioner():
    from super_rag_tpu.fileparser.base import AssetBinPart, ImagePart
    from super_rag_tpu.index.vision import vision_rows

    def captioner(prompt, images):
        assert images[0]["mime_type"] == "image/png"
        return "A bar chart of QPS by batch size."

    parts = [
        ImagePart(url="asset://x1"),
        AssetBinPart(data=b"png", asset_id="x1", mime_type="image/png"),
    ]
    rows = vision_rows(parts, vision_completion=captioner)
    assert rows[0]["text"].startswith("A bar chart")
