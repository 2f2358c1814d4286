"""From-scratch PNG codec (RFC 2083 / ISO 15948) — stdlib zlib only.

PNG is the second-most-common image format in a web crawl (after
JPEG), and unlike JPEG it is LOSSLESS — so the pin here is exact:
``decode_png(encode_png(img)) == img`` bit-for-bit, with the encoder
cycling through all five scanline filters so every unfilter path is
exercised by the roundtrip.

Supported: 8-bit greyscale (color type 0), truecolor (2),
grey+alpha (4) and RGBA (6), non-interlaced, all five filters
(None/Sub/Up/Average/Paeth), multi-IDAT streams, CRC-verified
chunks. Refused BY NAME (the honest boundary, not a wrong answer):
palette images (3), 16-bit channels, Adam7 interlace. The alpha
channel is dropped on decode (this pipeline extracts features from
color planes; compositing policy belongs to the caller).

Like the JPEG codec, everything derives from the published standard:
chunk layout, filter definitions (RFC 2083 §6), the Paeth predictor,
and zlib/deflate via the standard library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "PNG_MAGIC"]

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"decompressed IDAT length {len(raw)} != expected "
            f"{h * (stride + 1)} for {w}x{h}x{ch}")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=pos + 1).astype(np.int32)
        pos += stride + 1
        prior = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32)
        if ftype == 0:          # None
            cur = row
        elif ftype == 2:        # Up
            cur = (row + prior) & 0xFF
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                if ftype == 1:          # Sub
                    cur[x] = (row[x] + a) & 0xFF
                elif ftype == 3:        # Average
                    cur[x] = (row[x] + ((a + prior[x]) >> 1)) & 0xFF
                else:                   # Paeth
                    c = prior[x - ch] if x >= ch else 0
                    cur[x] = (row[x]
                              + _paeth(int(a), int(prior[x]),
                                       int(c))) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) RGB uint8 (grey replicated, alpha
    dropped). CRC-checked; refusals name the unsupported feature."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        crc, = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(
                f"CRC mismatch in {ctype.decode('latin-1')} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        # ancillary chunks skipped
    if ihdr is None or not idat:
        raise ValueError("incomplete PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit channels unsupported "
                                  "(8-bit only)")
    if color == 3:
        raise NotImplementedError("palette (indexed) PNG unsupported")
    if color not in _CHANNELS:
        raise ValueError(f"invalid color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if interlace == 1:
        raise NotImplementedError("Adam7 interlaced PNG unsupported")
    if interlace != 0:
        raise ValueError(f"invalid interlace method {interlace}")
    ch = _CHANNELS[color]
    img = _unfilter(zlib.decompress(bytes(idat)), h, w, ch)
    if color == 0:
        return np.repeat(img, 3, axis=2)
    if color == 2:
        return img
    if color == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGBA: alpha dropped


def _filter_row(ftype: int, row: np.ndarray, prior: np.ndarray,
                ch: int) -> np.ndarray:
    r = row.astype(np.int32)
    p = prior.astype(np.int32)
    stride = len(r)
    left = np.zeros(stride, dtype=np.int32)
    left[ch:] = r[:-ch]
    if ftype == 0:
        return row
    if ftype == 1:
        return ((r - left) & 0xFF).astype(np.uint8)
    if ftype == 2:
        return ((r - p) & 0xFF).astype(np.uint8)
    if ftype == 3:
        return ((r - ((left + p) >> 1)) & 0xFF).astype(np.uint8)
    upleft = np.zeros(stride, dtype=np.int32)
    upleft[ch:] = p[:-ch]
    out = np.zeros(stride, dtype=np.uint8)
    for x in range(stride):
        out[x] = (r[x] - _paeth(int(left[x]), int(p[x]),
                                int(upleft[x]))) & 0xFF
    return out


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) grey / (h, w, 3) RGB / (h, w, 4) RGBA uint8 -> PNG.

    Each scanline uses filter ``y % 5``, cycling through all five
    filter types — the encoder exists to PIN the decoder, so every
    unfilter path runs in a single roundtrip."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    flat = img.reshape(h, w * ch)
    raw = bytearray()
    for y in range(h):
        ftype = y % 5
        prior = flat[y - 1] if y else np.zeros(w * ch, dtype=np.uint8)
        raw.append(ftype)
        raw += _filter_row(ftype, flat[y], prior, ch).tobytes()
    out = bytearray(PNG_MAGIC)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color,
                                       0, 0, 0))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), level))
    out += _chunk(b"IEND", b"")
    return bytes(out)
