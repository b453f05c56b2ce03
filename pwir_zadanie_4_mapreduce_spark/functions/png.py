"""Pure-stdlib PNG codec (grayscale 8-bit, non-interlaced).

The container ships no image libraries, but PNG's baseline is just
zlib + five per-row byte filters — both stdlib-expressible — so the
multimodal decode seam can run a REAL decode instead of the
deterministic fake: real signature/chunk/CRC parsing, real zlib
inflate, real unfiltering (None/Sub/Up/Average/Paeth per the PNG
spec, RFC 2083 §6), real pixel stats.

Scope is deliberately the smallest spec subset that makes the decode
genuine: bit depth 8, color type 0 (grayscale), no interlace, any
number of IDAT chunks. The encoder cycles all five filter types
(filter = row % 5) so a decode exercises every unfilter path.

``make_png_codec`` returns the codec as NESTED functions so Spark
workers receive them pickled BY VALUE inside mapInPandas closures
(the driver's session may be built from any cwd, in which case
workers cannot import this package — the repo-wide closure rule).
"""

from __future__ import annotations


def make_png_codec():
    """Return (encode_png, decode_png) as self-contained closures.

    encode_png(width, height, pixels: bytes) -> bytes
        pixels is row-major grayscale, len == width*height.
    decode_png(data: bytes) -> (width, height, bytearray)
        Raises ValueError on bad signature, CRC, length, or an
        unsupported feature (bit depth != 8, color != grayscale,
        interlace).
    """
    import struct
    import zlib

    SIG = b"\x89PNG\r\n\x1a\n"

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    def encode_png(width: int, height: int, pixels: bytes) -> bytes:
        if len(pixels) != width * height:
            raise ValueError("pixels length != width*height")
        raw = bytearray()
        prev = bytes(width)
        for y in range(height):
            row = pixels[y * width : (y + 1) * width]
            ftype = y % 5  # cycle every filter so decodes are honest
            raw.append(ftype)
            for x in range(width):
                cur = row[x]
                left = row[x - 1] if x > 0 else 0
                up = prev[x]
                upleft = prev[x - 1] if x > 0 else 0
                if ftype == 0:
                    v = cur
                elif ftype == 1:
                    v = cur - left
                elif ftype == 2:
                    v = cur - up
                elif ftype == 3:
                    v = cur - ((left + up) >> 1)
                else:
                    v = cur - _paeth(left, up, upleft)
                raw.append(v & 0xFF)
            prev = row
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        return (
            SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b"")
        )

    def decode_png(data: bytes):
        if data[:8] != SIG:
            raise ValueError("not a PNG: bad signature")
        pos = 8
        width = height = None
        idat = bytearray()
        while pos < len(data):
            if pos + 8 > len(data):
                raise ValueError("truncated chunk header")
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            ctype = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            if len(body) != length:
                raise ValueError("truncated chunk body")
            (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
            if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
                raise ValueError(f"CRC mismatch in {ctype!r}")
            if ctype == b"IHDR":
                width, height, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or color != 0:
                    raise ValueError("only 8-bit grayscale supported")
                if interlace != 0:
                    raise ValueError("interlace not supported")
            elif ctype == b"IDAT":
                idat.extend(body)
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if width is None:
            raise ValueError("missing IHDR")
        raw = zlib.decompress(bytes(idat))
        if len(raw) != height * (width + 1):
            raise ValueError("decompressed size mismatch")
        out = bytearray(width * height)
        prev = bytes(width)
        for y in range(height):
            ftype = raw[y * (width + 1)]
            line = raw[y * (width + 1) + 1 : (y + 1) * (width + 1)]
            row = bytearray(width)
            for x in range(width):
                v = line[x]
                left = row[x - 1] if x > 0 else 0
                up = prev[x]
                upleft = prev[x - 1] if x > 0 else 0
                if ftype == 0:
                    r = v
                elif ftype == 1:
                    r = v + left
                elif ftype == 2:
                    r = v + up
                elif ftype == 3:
                    r = v + ((left + up) >> 1)
                elif ftype == 4:
                    r = v + _paeth(left, up, upleft)
                else:
                    raise ValueError(f"bad filter type {ftype}")
                row[x] = r & 0xFF
            out[y * width : (y + 1) * width] = row
            prev = bytes(row)
        return width, height, out

    return encode_png, decode_png
