"""Legacy binary Office parsing: CFB container, .doc piece table, .ppt
text atoms.  Test files are synthesized by a spec-faithful [MS-CFB]
writer below (512-byte sectors, header DIFAT, FAT chains, mini stream +
miniFAT for sub-4096 streams) so the reader is exercised on the real
on-disk structures, not mocks."""

import struct

import pytest

from super_rag_tpu.fileparser.olebinary import (
    CompoundFile,
    LegacyDocParser,
    LegacyPptParser,
    extract_doc_text,
    extract_ppt_text,
)

SECT = 512
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
NOSTREAM = 0xFFFFFFFF


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """Minimal [MS-CFB] v3 writer: regular FAT streams for >= 4096 bytes,
    mini-stream + miniFAT for smaller ones."""
    mini_cutoff = 4096
    big = {n: d for n, d in streams.items() if len(d) >= mini_cutoff}
    small = {n: d for n, d in streams.items() if len(d) < mini_cutoff}

    # mini stream: concatenation of small streams in 64-byte mini sectors
    mini_data = bytearray()
    mini_fat: list[int] = []
    mini_starts: dict[str, int] = {}
    for name, d in small.items():
        start = len(mini_fat)
        n_min = -(-len(d) // 64) or 1
        mini_starts[name] = start
        for i in range(n_min - 1):
            mini_fat.append(start + i + 1)
        mini_fat.append(ENDOFCHAIN)
        mini_data.extend(d)
        mini_data.extend(b"\0" * ((-len(d)) % 64))

    sectors: list[bytes] = []
    fat: list[int] = []

    def add_stream(data: bytes) -> int:
        start = len(sectors)
        n_sec = -(-len(data) // SECT) or 1
        for i in range(n_sec):
            sectors.append(data[i * SECT : (i + 1) * SECT].ljust(SECT, b"\0"))
            fat.append(start + i + 1)
        fat[-1] = ENDOFCHAIN
        return start

    big_starts = {name: add_stream(d) for name, d in big.items()}
    mini_start_sec = add_stream(bytes(mini_data)) if mini_data else ENDOFCHAIN

    minifat_start = ENDOFCHAIN
    n_minifat = 0
    if mini_fat:
        raw = b"".join(struct.pack("<I", v) for v in mini_fat)
        minifat_start = add_stream(raw)
        n_minifat = -(-len(raw) // SECT)

    # directory entries
    def dirent(name: str, etype: int, start: int, size: int,
               child: int = NOSTREAM) -> bytes:
        raw = bytearray(128)
        enc = name.encode("utf-16-le")
        raw[: len(enc)] = enc
        struct.pack_into("<H", raw, 0x40, len(enc) + 2)
        raw[0x42] = etype
        raw[0x43] = 1  # black
        struct.pack_into("<I", raw, 0x44, NOSTREAM)  # left
        struct.pack_into("<I", raw, 0x48, NOSTREAM)  # right
        struct.pack_into("<I", raw, 0x4C, child)
        struct.pack_into("<I", raw, 0x74, start)
        struct.pack_into("<Q", raw, 0x78, size)
        return bytes(raw)

    entries = [dirent("Root Entry", 5, mini_start_sec, len(mini_data),
                      child=1 if streams else NOSTREAM)]
    for name, d in big.items():
        entries.append(dirent(name, 2, big_starts[name], len(d)))
    for name, d in small.items():
        entries.append(dirent(name, 2, mini_starts[name], len(d)))
    dir_raw = b"".join(entries)
    dir_start = add_stream(dir_raw)

    # FAT sectors themselves (marked FATSECT = 0xFFFFFFFD)
    n_data = len(sectors)
    n_fat = 1
    while (n_data + n_fat) * 4 > n_fat * SECT:
        n_fat += 1
    fat_start = len(sectors)
    fat_full = fat + [0xFFFFFFFD] * n_fat
    fat_full += [FREESECT] * (n_fat * (SECT // 4) - len(fat_full))
    raw = b"".join(struct.pack("<I", v) for v in fat_full)
    for i in range(n_fat):
        sectors.append(raw[i * SECT : (i + 1) * SECT])

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 0x18, 0x003E)  # minor
    struct.pack_into("<H", header, 0x1A, 0x0003)  # major v3
    struct.pack_into("<H", header, 0x1C, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 0x1E, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 0x20, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 0x2C, n_fat)
    struct.pack_into("<I", header, 0x30, dir_start)
    struct.pack_into("<I", header, 0x38, mini_cutoff)
    struct.pack_into("<I", header, 0x3C, minifat_start)
    struct.pack_into("<I", header, 0x40, n_minifat)
    struct.pack_into("<I", header, 0x44, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 0x48, 0)
    difat = [fat_start + i for i in range(n_fat)]
    difat += [FREESECT] * (109 - len(difat))
    struct.pack_into("<109I", header, 0x4C, *difat)
    return bytes(header) + b"".join(sectors)


def make_doc(paragraphs_8bit: list[str], paragraphs_16bit: list[str]) -> bytes:
    """Synthesize a Word97 .doc: one cp1252 piece + one UTF-16 piece."""
    text8 = "\r".join(paragraphs_8bit) + "\r"
    text16 = "\r".join(paragraphs_16bit) + "\r"
    word = bytearray(2048)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 0x0A, 0)  # table stream 0
    fc8 = 1024
    raw8 = text8.encode("cp1252")
    word[fc8 : fc8 + len(raw8)] = raw8
    fc16 = 1536
    raw16 = text16.encode("utf-16-le")
    word[fc16 : fc16 + len(raw16)] = raw16
    ccp = len(text8) + len(text16)
    struct.pack_into("<I", word, 0x004C, ccp)

    # Clx: Pcdt with a 2-piece PlcPcd
    cps = [0, len(text8), ccp]
    pcd8 = struct.pack("<HIH", 0, (fc8 * 2) | (1 << 30), 0)
    pcd16 = struct.pack("<HIH", 0, fc16, 0)
    plc = b"".join(struct.pack("<I", c) for c in cps) + pcd8 + pcd16
    clx = bytes([2]) + struct.pack("<I", len(plc)) + plc
    fc_clx = 64
    table = bytearray(fc_clx + len(clx))
    table[fc_clx:] = clx
    struct.pack_into("<I", word, 0x01A2, fc_clx)
    struct.pack_into("<I", word, 0x01A6, len(clx))
    return write_cfb({"WordDocument": bytes(word), "0Table": bytes(table)})


def make_ppt(slide_texts: list[str]) -> bytes:
    """Synthesize a .ppt: a container record holding text atoms."""
    atoms = b""
    for i, t in enumerate(slide_texts):
        if i % 2 == 0:
            body = t.encode("utf-16-le")
            atoms += struct.pack("<HHI", 0, 0x0FA0, len(body)) + body
        else:
            body = t.encode("cp1252")
            atoms += struct.pack("<HHI", 0, 0x0FA8, len(body)) + body
    container = struct.pack("<HHI", 0xF, 0x03EE, len(atoms)) + atoms
    return write_cfb({"PowerPoint Document": container,
                      "Current User": b"\0" * 24})


def test_cfb_roundtrip_big_and_mini():
    big = bytes(range(256)) * 32  # 8192 bytes -> regular FAT
    small = b"tiny stream payload"  # -> mini stream
    blob = write_cfb({"BigStream": big, "SmallStream": small})
    cf = CompoundFile(blob)
    assert set(cf.stream_names()) == {"BigStream", "SmallStream"}
    assert cf.stream("bigstream") == big  # case-insensitive
    assert cf.stream("SmallStream") == small
    assert cf.stream("Missing") is None


def test_doc_piece_table_mixed_encodings():
    doc = make_doc(
        ["Hello legacy Word.", "Second cp1252 paragraph."],
        ["Unicode pièce résistánce — café."],
    )
    text = extract_doc_text(doc)
    assert "Hello legacy Word." in text
    assert "Second cp1252 paragraph." in text
    assert "café" in text and "—" in text


def test_doc_parser_parts():
    doc = make_doc(["Alpha paragraph.", "Beta paragraph."], ["Gamma."])
    parts = LegacyDocParser().parse_file("x.doc", data=doc)
    contents = [p.content for p in parts]
    assert "Alpha paragraph." in contents
    assert "Gamma." in contents


def test_doc_not_cfb_rejected():
    with pytest.raises(ValueError):
        extract_doc_text(b"PK\x03\x04 not a doc at all" * 40)


def test_ppt_text_atoms():
    ppt = make_ppt(["Slide One Title", "Bullet two cp1252", "Third atom"])
    texts = extract_ppt_text(ppt)
    assert texts == ["Slide One Title", "Bullet two cp1252", "Third atom"]
    parts = LegacyPptParser().parse_file("x.ppt", data=ppt)
    assert [p.content for p in parts] == [
        "Slide One Title", "Bullet two cp1252", "Third atom"
    ]


def test_docparser_dispatch_legacy():
    from super_rag_tpu.fileparser.parser import DocParser

    dp = DocParser()
    assert ".doc" in dp.supported_extensions()
    assert ".ppt" in dp.supported_extensions()
    doc = make_doc(["Dispatch check."], ["Ok."])
    parts = dp.parse_file("legacy.doc", data=doc)
    assert any("Dispatch check." in p.content for p in parts)
