"""7z reader roundtrip tests.

No 7z tooling exists in this image (no p7zip binary, no py7zr), so the
fixtures are produced by a minimal spec-conformant writer below: single
LZMA2 folder with sub-streams, optional empty files / directories, and
an optional LZMA2-compressed (encoded) header — the layout 7-Zip and
py7zr emit by default.
"""

from __future__ import annotations

import lzma
import zlib

import pytest

from super_rag_tpu.utils.sevenzip import SevenZipError, iter_7z
from super_rag_tpu.utils.uncompress import iter_archive, supported_archive


def _num(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    return b"\xff" + v.to_bytes(8, "little")


def _bits(flags: list[bool]) -> bytes:
    out = bytearray()
    b = 0
    mask = 0x80
    for f in flags:
        if f:
            b |= mask
        mask >>= 1
        if mask == 0:
            out.append(b)
            b, mask = 0, 0x80
    if mask != 0x80:
        out.append(b)
    return bytes(out)


def _lzma2(payload: bytes) -> tuple[bytes, bytes]:
    """(packed bytes, coder props) for one raw LZMA2 stream."""
    spec = {"id": lzma.FILTER_LZMA2, "preset": 6}
    packed = lzma.compress(payload, format=lzma.FORMAT_RAW, filters=[spec])
    props = lzma._encode_filter_properties(spec)  # noqa: SLF001
    return packed, props


def _streams_info(pack_pos: int, packed: bytes, props: bytes,
                  sub_sizes: list[int]) -> bytes:
    total = sum(sub_sizes)
    out = bytearray()
    out += _num(0x06) + _num(pack_pos) + _num(1)          # kPackInfo
    out += _num(0x09) + _num(len(packed)) + _num(0x00)    # kSize, kEnd
    out += _num(0x07)                                     # kUnpackInfo
    out += _num(0x0B) + _num(1) + b"\x00"                 # kFolder x1
    out += _num(1)                                        # numCoders
    out += bytes([0x21]) + b"\x21" + _num(len(props)) + props  # LZMA2
    out += _num(0x0C) + _num(total) + _num(0x00)          # unpack size
    if len(sub_sizes) != 1:
        out += _num(0x08)                                 # kSubStreamsInfo
        out += _num(0x0D) + _num(len(sub_sizes))
        out += _num(0x09)
        for s in sub_sizes[:-1]:
            out += _num(s)
        out += _num(0x00)
    out += _num(0x00)                                     # end StreamsInfo
    return bytes(out)


def write_7z(files: list[tuple[str, bytes | None]],
             encoded_header: bool = False) -> bytes:
    """files: (name, payload) with payload=None meaning a directory and
    payload=b"" an empty file."""
    content_files = [(n, p) for n, p in files if p]
    payload = b"".join(p for _, p in content_files)
    packed, props = _lzma2(payload)
    sub_sizes = [len(p) for _, p in content_files]

    header = bytearray()
    header += _num(0x01)                                  # kHeader
    if content_files:
        header += _num(0x04)                              # kMainStreamsInfo
        header += _streams_info(0, packed, props, sub_sizes)
    header += _num(0x05) + _num(len(files))               # kFilesInfo
    empty_stream = [p is None or p == b"" for _, p in files]
    if any(empty_stream):
        bs = _bits(empty_stream)
        header += _num(0x0E) + _num(len(bs)) + bs
        empty_file = [p == b"" for _, p in files if p is None or p == b""]
        if any(empty_file):
            bf = _bits(empty_file)
            header += _num(0x0F) + _num(len(bf)) + bf
    names = b"".join((n + "\x00").encode("utf-16-le") for n, _ in files)
    header += _num(0x11) + _num(len(names) + 1) + b"\x00" + names
    header += _num(0x00)                                  # end FilesInfo
    header += _num(0x00)                                  # end Header
    header = bytes(header)

    if encoded_header:
        hpacked, hprops = _lzma2(header)
        nh = _num(0x17) + _streams_info(len(packed), hpacked, hprops,
                                        [len(header)])
        body = packed + hpacked
    else:
        nh = header
        body = packed

    start = (len(body)).to_bytes(8, "little") + \
        (len(nh)).to_bytes(8, "little") + \
        zlib.crc32(nh).to_bytes(4, "little")
    sig = b"7z\xbc\xaf\x27\x1c" + b"\x00\x04" + \
        zlib.crc32(start).to_bytes(4, "little") + start
    return sig + body + nh


FILES = [
    ("docs/a.md", b"# alpha\n" * 40),
    ("docs/b.txt", b"beta beta beta" * 100),
    ("empty.txt", b""),
    ("docs", None),
    ("c.bin", bytes(range(256)) * 17),
]


def test_roundtrip_plain_header():
    data = write_7z(FILES)
    got = dict(iter_7z(data))
    assert got == {"docs/a.md": FILES[0][1], "docs/b.txt": FILES[1][1],
                   "empty.txt": b"", "c.bin": FILES[4][1]}


def test_roundtrip_encoded_header():
    data = write_7z(FILES, encoded_header=True)
    got = dict(iter_7z(data))
    assert got["docs/b.txt"] == FILES[1][1]
    assert got["empty.txt"] == b""
    assert "docs" not in got  # directory skipped


def test_single_file_no_substreams_block():
    data = write_7z([("only.txt", b"payload bytes")])
    assert dict(iter_7z(data)) == {"only.txt": b"payload bytes"}


def test_iter_archive_dispatch_and_limits():
    assert supported_archive("x.7z")
    data = write_7z(FILES, encoded_header=True)
    members = dict(iter_archive("bundle.7z", data))
    assert members["docs/a.md"] == FILES[0][1]
    # traversal-unsafe names are skipped by iter_archive
    evil = write_7z([("../escape.txt", b"nope"), ("ok.txt", b"fine")])
    assert dict(iter_archive("e.7z", evil)) == {"ok.txt": b"fine"}


def test_malformed_and_unsupported():
    with pytest.raises(SevenZipError):
        list(iter_7z(b"PK\x03\x04 not 7z at all"))
    data = bytearray(write_7z([("a.txt", b"x" * 100)]))
    data[20] = 0xFF  # corrupt next-header size
    with pytest.raises(SevenZipError):
        list(iter_7z(bytes(data)))
    with pytest.raises(ValueError):
        list(iter_archive("x.rar", b""))
