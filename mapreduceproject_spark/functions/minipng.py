"""Minimal pure-stdlib PNG codec for the real-decode path.

Scope: 8-bit, non-interlaced, color types 0 (grayscale) and 2 (RGB) —
exactly enough to exercise ``decode_image_real``'s Arrow kernel
end-to-end in an environment without Pillow, with a real (zlib) decode
of real (spec-conformant) PNG bytes.  NOT a general codec: ``decode_png``
raises ValueError on anything outside that envelope, and callers with
Pillow installed never reach it.

Format per the W3C PNG spec: 8-byte signature, length-type-data-CRC
chunks (IHDR/IDAT/IEND), zlib-deflated scanlines each prefixed by a
filter byte.  The encoder always writes filter 0 (None); the decoder
un-filters all five standard filters so externally-produced simple PNGs
(e.g. Pillow's, which picks filters adaptively) also decode.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(width: int, height: int, pixels: bytes, mode: str = "L") -> bytes:
    """Spec-conformant PNG bytes for 8-bit ``mode`` in {"L", "RGB"};
    ``pixels`` is row-major interleaved (len = w*h*channels)."""
    if mode not in ("L", "RGB"):
        raise ValueError(f"mode must be L or RGB, got {mode!r}")
    channels = 1 if mode == "L" else 3
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels} for {width}x{height} {mode}"
        )
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter 0: None
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, 0 if mode == "L" else 2, 0, 0, 0
    )
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, str, bytes]:
    """(width, height, mode, interleaved 8-bit pixels) for a supported
    PNG; ValueError otherwise."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, bits, ct, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if bits != 8 or ct not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bits={bits}, color_type={ct}, "
            f"interlace={interlace}); minipng handles 8-bit non-interlaced "
            f"grayscale/RGB only"
        )
    ch = 1 if ct == 0 else 3
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown scanline filter {f}")
        out += line
        prev = line
    return w, h, ("L" if ct == 0 else "RGB"), bytes(out)


def luma(r: int, g: int, b: int) -> int:
    """Pillow's exact RGB->L integer conversion (ITU-R 601-2 weights in
    16.16 fixed point with rounding) — the two codec paths of
    decode_image_real must produce the SAME mean_pixel for the same
    bytes, so the fallback mirrors PIL's arithmetic, not a float
    approximation of it."""
    return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
