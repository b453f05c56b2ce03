"""Unit tests for the pure-stdlib PNG codec behind the multimodal
decode seam (functions/png.py) — roundtrip across sizes that hit all
five row filters, spec-subset guards, and corruption detection."""

from __future__ import annotations

import struct
import zlib

import pytest

from pwir_zadanie_4_mapreduce_spark.functions.png import make_png_codec


@pytest.fixture(scope="module")
def codec():
    return make_png_codec()


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (16, 1), (5, 5), (16, 14), (13, 6)])
def test_roundtrip(codec, w, h):
    encode_png, decode_png = codec
    px = bytes(((x * 7 + y * 13 + 3) % 256) for y in range(h) for x in range(w))
    gw, gh, got = decode_png(encode_png(w, h, px))
    assert (gw, gh) == (w, h)
    assert bytes(got) == px


def test_roundtrip_exercises_every_filter(codec):
    # height >= 5 guarantees rows with filter types 0..4 (filter = y % 5)
    encode_png, decode_png = codec
    w, h = 9, 11
    px = bytes(((31 * x * y + x + 254 * y) % 256) for y in range(h) for x in range(w))
    data = encode_png(w, h, px)
    raw = zlib.decompress(_chunk_body(data, b"IDAT"))
    assert {raw[y * (w + 1)] for y in range(h)} == {0, 1, 2, 3, 4}
    assert bytes(decode_png(data)[2]) == px


def _chunk_body(data: bytes, want: bytes) -> bytes:
    pos, body = 8, bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if data[pos + 4 : pos + 8] == want:
            body.extend(data[pos + 8 : pos + 8 + length])
        pos += 12 + length
    return bytes(body)


def test_crc_corruption_detected(codec):
    encode_png, decode_png = codec
    data = bytearray(encode_png(4, 4, bytes(range(16))))
    data[40] ^= 0xFF  # somewhere inside IDAT
    # the per-chunk CRC check must fire BEFORE inflate ever sees the
    # corrupt bytes — no zlib.error alternative here on purpose
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_bad_signature_rejected(codec):
    _, decode_png = codec
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(10))


def test_wrong_pixel_count_rejected(codec):
    encode_png, _ = codec
    with pytest.raises(ValueError, match="length"):
        encode_png(4, 4, bytes(15))


def test_roundtrip_property(codec):
    """Property: any grayscale image round-trips bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    encode_png, decode_png = codec

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(w, h, seed):
        # xorshift-ish deterministic bytes from the seed (hypothesis
        # shrinks over (w, h, seed) — cheaper than a raw bytes strategy
        # that must match w*h exactly)
        x, out = seed or 1, bytearray()
        for _ in range(w * h):
            x ^= (x << 13) & 0xFFFFFFFF
            x ^= x >> 17
            x ^= (x << 5) & 0xFFFFFFFF
            out.append(x & 0xFF)
        px = bytes(out)
        gw, gh, got = decode_png(encode_png(w, h, px))
        assert (gw, gh) == (w, h) and bytes(got) == px

    check()
