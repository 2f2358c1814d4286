"""From-scratch PNG codec (RFC 2083 / ISO 15948) — stdlib zlib only.

PNG is the second-most-common image format in a web crawl (after
JPEG), and unlike JPEG it is LOSSLESS — so the pin here is exact:
``decode_png(encode_png(img)) == img`` bit-for-bit, with the encoder
cycling through all five scanline filters so every unfilter path is
exercised by the roundtrip.

Supported: greyscale (color type 0, bit depths 1/2/4/8/16),
truecolor (2, 8/16), PALETTE (3, 1/2/4/8, PLTE + optional tRNS),
grey+alpha (4, 8/16) and RGBA (6, 8/16); non-interlaced AND Adam7
interlaced; all five filters (None/Sub/Up/Average/Paeth) at every
byte-per-pixel width; multi-IDAT streams; CRC-verified chunks.
16-bit samples decode to their high byte (the 8-bit feature pipeline
policy; the encoder's 16-bit path writes v<<8|v so the roundtrip
still pins exactly). The alpha channel — RGBA, grey+alpha, or
palette tRNS — is dropped on decode (this pipeline extracts features
from color planes; compositing policy belongs to the caller).
Refused BY NAME: nothing structural remains; only genuinely invalid
streams (CRC, bad filter/color/depth combos, short data) error.

Like the JPEG codec, everything derives from the published standard:
chunk layout, filter definitions (RFC 2083 §6), the Paeth predictor,
Adam7 pass geometry (ISO 15948 §8.2), and zlib/deflate via the
standard library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "PNG_MAGIC"]

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}

# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass
# (ISO 15948 §8.2). Each pass is an independently-filtered sub-image;
# passes that are empty at a given size contribute zero bytes.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _scanline_shape(w: int, ch: int, depth: int) -> tuple[int, int]:
    """(filter byte offset bpp, scanline byte length) — filters
    operate on BYTES, with the 'pixel to the left' being bpp bytes
    back (1 for sub-byte depths, per the spec)."""
    bpp = max(1, (depth * ch) // 8)
    stride = (w * ch * depth + 7) // 8
    return bpp, stride


def _unfilter(raw: bytes, h: int, stride: int, bpp: int,
              pos: int) -> tuple[np.ndarray, int]:
    """Unfilter ``h`` scanlines of ``stride`` bytes starting at
    ``pos`` in the decompressed stream; returns ((h, stride) bytes,
    new position)."""
    if len(raw) - pos < h * (stride + 1):
        raise ValueError(
            f"decompressed IDAT too short: need {h * (stride + 1)} "
            f"bytes at {pos}, have {len(raw) - pos}")
    out = np.zeros((h, stride), dtype=np.uint8)
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
                a = cur[x - bpp] if x >= bpp else 0
                if ftype == 1:          # Sub
                    cur[x] = (row[x] + a) & 0xFF
                elif ftype == 3:        # Average
                    cur[x] = (row[x] + ((a + prior[x]) >> 1)) & 0xFF
                else:                   # Paeth
                    c = prior[x - bpp] if x >= bpp else 0
                    cur[x] = (row[x]
                              + _paeth(int(a), int(prior[x]),
                                       int(c))) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out, pos


def _rows_to_samples(rows: np.ndarray, w: int, ch: int,
                     depth: int) -> np.ndarray:
    """(h, stride) scanline bytes -> (h, w, ch) uint8 samples.
    Sub-byte depths unpack MSB-first; 16-bit takes the high byte
    (big-endian sample order)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :w * ch].reshape(h, w, ch)
    if depth == 16:
        return rows[:, 0:w * ch * 2:2].reshape(h, w, ch)
    # 1/2/4-bit (always ch == 1 per _VALID_DEPTHS): MSB-first
    bits = np.unpackbits(rows, axis=1)
    samples = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (samples * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :w].reshape(h, w, 1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) RGB uint8 (grey replicated and scaled
    to full range, palette looked up, 16-bit high byte, alpha
    dropped). CRC-checked; invalid streams name their defect."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
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
        elif ctype == b"PLTE":
            if length % 3 or length == 0 or length > 768:
                raise ValueError(f"PLTE length {length} not a valid "
                                 "multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data      # parsed for validation; alpha dropped
        elif ctype == b"IEND":
            break
        # other ancillary chunks skipped
    if ihdr is None or not idat:
        raise ValueError("incomplete PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if color not in _CHANNELS:
        raise ValueError(f"invalid color type {color}")
    if depth not in _VALID_DEPTHS[color]:
        raise ValueError(
            f"invalid bit depth {depth} for color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid interlace method {interlace}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    if color == 3 and trns is not None and len(trns) > len(plte):
        raise ValueError("tRNS longer than palette")
    ch = _CHANNELS[color]

    raw = zlib.decompress(bytes(idat))
    samples = np.zeros((h, w, ch), dtype=np.uint8)
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    rpos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        bpp, stride = _scanline_shape(pw, ch, depth)
        rows, rpos = _unfilter(raw, ph, stride, bpp, rpos)
        samples[y0::dy, x0::dx] = _rows_to_samples(rows, pw, ch, depth)
    if rpos != len(raw):
        raise ValueError(
            f"decompressed IDAT has {len(raw) - rpos} trailing bytes")

    if color == 3:
        if int(samples.max()) >= len(plte):
            raise ValueError("palette index beyond PLTE size")
        return plte[samples[:, :, 0]]
    if color == 0:
        if depth < 8:   # scale to full 8-bit range (e.g. 1-bit -> 255)
            samples = samples * (255 // ((1 << depth) - 1))
        return np.repeat(samples, 3, axis=2)
    if color == 2:
        return samples
    if color == 4:
        return np.repeat(samples[:, :, :1], 3, axis=2)
    return samples[:, :, :3]  # RGBA: alpha dropped


def _filter_row(ftype: int, row: np.ndarray, prior: np.ndarray,
                bpp: int) -> np.ndarray:
    r = row.astype(np.int32)
    p = prior.astype(np.int32)
    stride = len(r)
    left = np.zeros(stride, dtype=np.int32)
    left[bpp:] = r[:-bpp]
    if ftype == 0:
        return row
    if ftype == 1:
        return ((r - left) & 0xFF).astype(np.uint8)
    if ftype == 2:
        return ((r - p) & 0xFF).astype(np.uint8)
    if ftype == 3:
        return ((r - ((left + p) >> 1)) & 0xFF).astype(np.uint8)
    upleft = np.zeros(stride, dtype=np.int32)
    upleft[bpp:] = p[:-bpp]
    out = np.zeros(stride, dtype=np.uint8)
    for x in range(stride):
        out[x] = (r[x] - _paeth(int(left[x]), int(p[x]),
                                int(upleft[x]))) & 0xFF
    return out


def _filter_image(flat: np.ndarray, bpp: int) -> bytearray:
    """Filter (h, stride) scanline bytes with filter ``y % 5`` —
    cycling through all five filters so one roundtrip exercises
    every unfilter path."""
    raw = bytearray()
    h, stride = flat.shape
    for y in range(h):
        ftype = y % 5
        prior = flat[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        raw.append(ftype)
        raw += _filter_row(ftype, flat[y], prior, bpp).tobytes()
    return raw


def _pack_samples(img: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) uint8 samples -> (h, stride) scanline bytes at
    ``depth`` (MSB-first for sub-byte; v<<8|v expansion for 16)."""
    h, w, ch = img.shape
    if depth == 8:
        return img.reshape(h, w * ch)
    if depth == 16:
        out = np.empty((h, w * ch * 2), dtype=np.uint8)
        flat = img.reshape(h, w * ch)
        out[:, 0::2] = flat
        out[:, 1::2] = flat
        return out
    per = 8 // depth                       # samples per byte
    padded_w = ((w + per - 1) // per) * per
    vals = np.zeros((h, padded_w), dtype=np.uint8)
    vals[:, :w] = img[:, :, 0]
    bits = ((vals[:, :, None]
             >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(h, -1), axis=1)


def encode_png(img: np.ndarray, level: int = 6,
               interlace: bool = False, palette: bool = False,
               palette_alpha: np.ndarray | None = None,
               bit_depth: int = 8) -> bytes:
    """(h, w) grey / (h, w, 3) RGB / (h, w, 4) RGBA uint8 -> PNG.

    The encoder exists to PIN the decoder: scanlines cycle through
    all five filters; ``interlace`` writes Adam7 passes (each
    independently filtered); ``palette`` emits color type 3 with a
    PLTE built from the distinct colors (<= 2**bit_depth for
    bit_depth in 1/2/4/8 — the tightest depth is chosen
    automatically), plus a tRNS chunk when ``palette_alpha`` gives
    per-entry alpha; ``bit_depth=16`` writes each sample as v<<8|v
    so the high-byte decode policy still roundtrips losslessly."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    plte_chunks = b""
    if palette:
        if ch != 3:
            raise ValueError("palette encoding needs (h, w, 3) RGB")
        colors, inverse = np.unique(img.reshape(-1, 3), axis=0,
                                    return_inverse=True)
        depth = next((d for d in (1, 2, 4, 8)
                      if len(colors) <= (1 << d)), None)
        if depth is None:
            raise ValueError(f"{len(colors)} distinct colors > 256 "
                             "(quantize first)")
        color_type = 3
        samples = inverse.astype(np.uint8).reshape(h, w, 1)
        plte_chunks = _chunk(b"PLTE", colors.tobytes())
        if palette_alpha is not None:
            alpha = np.asarray(palette_alpha, dtype=np.uint8)
            if len(alpha) > len(colors):
                raise ValueError("palette_alpha longer than palette")
            plte_chunks += _chunk(b"tRNS", alpha.tobytes())
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
        if color_type is None:
            raise ValueError(f"unsupported channel count {ch}")
        if bit_depth not in (8, 16):
            raise ValueError("encoder writes 8- or 16-bit samples "
                             "for non-palette images")
        depth = bit_depth
        samples = img

    sch = samples.shape[2]
    raw = bytearray()
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in passes:
        sub = samples[y0::dy, x0::dx]
        ph, pw = sub.shape[0], sub.shape[1]
        if pw == 0 or ph == 0:
            continue
        bpp, _stride = _scanline_shape(pw, sch, depth)
        raw += _filter_image(_pack_samples(sub, depth), bpp)
    out = bytearray(PNG_MAGIC)
    out += _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0,
        1 if interlace else 0))
    out += plte_chunks
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), level))
    out += _chunk(b"IEND", b"")
    return bytes(out)
