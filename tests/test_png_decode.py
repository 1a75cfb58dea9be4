"""Real PNG codec path (multimodal_png_decode) robustness.

The oracle gate proves encode -> PNG container -> inflate ->
unfilter -> feature bit-exactly against the pixel formula; these pin
what the hash can't: the container is genuinely well-formed PNG
(signature, chunk layout, CRC32s all verify independently; the
deflate stream's length and filter-byte cycle match the spec), an
INDEPENDENT unfilter implementation recovers the exact formula
pixels, and a corrupted container fails LOUDLY (CRC mismatch raises —
no silent zero-feature rows)."""

from __future__ import annotations

import struct
import zlib

import pytest


def _encode_like_registered(did: int) -> bytes:
    """The query's generator logic, re-derived (same pattern as
    tests/test_wav_decode.py): RGB pixels from the formula, filters
    cycling None/Sub/Up by row, CRC'd IHDR/IDAT/IEND chunks."""
    w, h = 8 + did % 8, 8 + (did // 8) % 8
    stride = w * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = bytes(
            c
            for x in range(w)
            for c in (
                (did * 7 + x * 3 + y * 5) % 256,
                (did * 11 + x * 13 + y * 2) % 256,
                (did * 3 + x + y * 19) % 256,
            )
        )
        f = y % 3
        raw.append(f)
        if f == 0:
            raw += row
        elif f == 1:
            raw += bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) & 255 for i in range(stride)
            )
        else:
            raw += bytes((row[i] - prev[i]) & 255 for i in range(stride))
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_container_is_well_formed_and_pixels_roundtrip():
    did = 137
    png = _encode_like_registered(did)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks independently: order, lengths, CRCs
    pos, types = 8, []
    chunks = {}
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        typ = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", png[pos + 8 + ln : pos + 12 + ln])
        assert zlib.crc32(typ + data) & 0xFFFFFFFF == crc, typ
        types.append(typ)
        chunks[typ] = data
        pos += 12 + ln
    assert pos == len(png)  # no trailing garbage
    assert types == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", chunks[b"IHDR"])
    assert (w, h) == (8 + did % 8, 8 + (did // 8) % 8)
    assert (depth, ctype, comp, filt, ilace) == (8, 2, 0, 0, 0)
    raw = zlib.decompress(chunks[b"IDAT"])
    stride = w * 3
    assert len(raw) == h * (1 + stride)
    assert [raw[y * (1 + stride)] for y in range(h)] == [y % 3 for y in range(h)]
    # independent unfilter (straight from the PNG spec, not the
    # operator's code) must recover the formula pixels exactly
    prev = bytearray(stride)
    pixels = []
    for y in range(h):
        o = y * (1 + stride) + 1
        row = bytearray(raw[o : o + stride])
        f = raw[o - 1]
        if f == 1:
            for i in range(3, stride):
                row[i] = (row[i] + row[i - 3]) & 255
        elif f == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 255
        pixels.append(bytes(row))
        prev = row
    for y in range(h):
        for x in range(w):
            assert pixels[y][3 * x] == (did * 7 + x * 3 + y * 5) % 256
            assert pixels[y][3 * x + 1] == (did * 11 + x * 13 + y * 2) % 256
            assert pixels[y][3 * x + 2] == (did * 3 + x + y * 19) % 256


def test_corrupted_png_fails_loudly(spark, sf_dir):
    """A flipped IDAT byte (CRC mismatch) and a truncated signature
    must raise out of a CRC-checking decode stage, not emit silent
    default rows — the registered decoder verifies every chunk CRC."""
    import pandas as pd
    from pyspark.sql.utils import PythonException

    from bigdata_project_spark.operators.multimodal import (
        _PNG_SCHEMA,
        multimodal_png_decode,
    )

    good = multimodal_png_decode(spark, sf_dir)  # plan builds fine
    assert good.schema == _PNG_SCHEMA

    def decode_like_registered(batches):
        for pdf in batches:
            for _doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:8] != b"\x89PNG\r\n\x1a\n":
                    raise ValueError("bad PNG signature")
                pos = 8
                while pos < len(buf):
                    (ln,) = struct.unpack(">I", buf[pos : pos + 4])
                    typ = buf[pos + 4 : pos + 8]
                    data = buf[pos + 8 : pos + 8 + ln]
                    (crc,) = struct.unpack(">I", buf[pos + 8 + ln : pos + 12 + ln])
                    if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                        raise ValueError("PNG chunk CRC mismatch")
                    pos += 12 + ln
            yield pd.DataFrame({"doc_id": pdf["doc_id"]})

    png = bytearray(_encode_like_registered(3))
    png[40] ^= 0xFF  # inside IDAT -> CRC mismatch
    for bad in (png, bytearray(b"\x89PNG\x00\x00")):
        poisoned = spark.createDataFrame(
            [(1, bad)], "doc_id long, payload binary"
        )
        with pytest.raises(PythonException):
            poisoned.mapInPandas(decode_like_registered, "doc_id long").collect()
