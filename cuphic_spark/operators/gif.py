"""From-scratch GIF codec (GIF89a) — pure Python/numpy.

GIF is the third web image staple and the ONE animated format a
codec-free pipeline can decode: LZW is fully specified in the GIF89a
document (Appendix F), so multi-frame decode — frames, delays,
disposal, transparency — needs no external library. That upgrades
``sample_frames`` from metadata math to REAL frames for GIF rows.

Supported: global/local color tables, interlaced images (the 4-pass
row shuffle), multiple frames with graphic-control extensions
(delay, transparency index, ALL disposal methods 0-3 — 3 snapshots
the frame rect before rendering and restores it after, exactly one
rect of lookback per GIF89a), multi-sub-block LZW streams, 2-12-bit
variable code widths with CLEAR handling.

The encoder exists to PIN the decoder (like jpeg/png): any frame
sequence with <= 256 distinct colors across frames roundtrips
EXACTLY (GIF is lossless once the palette fits), with interlace and
per-frame delays exercised.

Width-bump rule (GIF89a App. F): both sides grow the code width
when the next free slot reaches 2**width (cap 12 bits).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif", "GIF_MAGIC"]

GIF_MAGIC = b"GIF8"

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = mcs + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"LZW code {code} beyond table "
                                 f"size {len(table)}")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out)
    return bytes(out)


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = mcs + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF bytes -> (frames, delays_ms): frames is (n, h, w, 3)
    uint8 composited onto the logical screen (disposal 0/1 leave the
    frame, 2 restores the background color over the frame rect;
    transparent pixels keep the underlying canvas)."""
    if payload[:4] != GIF_MAGIC or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a)")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames = []
    delays = []
    delay = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, d, tidx = struct.unpack(
                    "<BHB", payload[pos + 1:pos + 5])
                pos += 1 + size + 1  # size, body, terminator
                delay = d * 10
                transparent = tidx if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            else:  # comment/application/plain-text: skip sub-blocks
                while payload[pos]:
                    pos += 1 + payload[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
        left, top, fw, fh, iflags = struct.unpack(
            "<HHHHB", payload[pos:pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload, dtype=np.uint8,
                                  count=3 * n,
                                  offset=pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("image has no color table")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = np.frombuffer(
            _lzw_decode(mcs, bytes(data), fw * fh), dtype=np.uint8)
        if len(idx) < fw * fh:
            raise ValueError("LZW stream ended before frame complete")
        grid = idx[:fw * fh].reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive pass-ordered
            order = _deinterlace_rows(fh)
            fixed = np.empty_like(grid)
            fixed[order] = grid
            grid = fixed
        if int(grid.max()) >= len(table):
            raise ValueError("pixel index beyond color table")
        region = canvas[top:top + fh, left:left + fw]
        # disposal 3 (restore-to-previous): snapshot the rect this
        # frame will overwrite BEFORE rendering; restored after the
        # frame displays (GIF89a §23 — the decoder restores "what was
        # there prior to rendering the graphic"). One rect of
        # lookback, bounded by the frame size.
        prev_rect = region.copy() if disposal == 3 else None
        rgb = table[grid]
        if transparent is not None:
            mask = (grid != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            # the background color index is defined against the
            # GLOBAL color table (GIF89a §18); with only a local
            # table the background is unspecified -> black
            bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
                      else np.zeros(3, dtype=np.uint8))
            canvas[top:top + fh, left:left + fw] = bg_rgb
        elif disposal == 3:
            canvas[top:top + fh, left:left + fw] = prev_rect
        # a graphic-control extension applies ONLY to the first
        # following rendering block (GIF89a §23) — reset so a frame
        # without its own GCE doesn't inherit the previous frame's
        # transparency/disposal/delay
        delay = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def encode_gif(frames: np.ndarray, delays_ms: list[int] | None = None,
               interlace: bool = False) -> bytes:
    """(n, h, w, 3) or (h, w, 3) uint8 -> GIF89a bytes. All frames
    share one global palette built from the distinct colors (<= 256
    required — raises otherwise); lossless by construction."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    colors, inverse = np.unique(frames.reshape(-1, 3), axis=0,
                                return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors > 256 "
                         "(quantize first)")
    bits = max(1, int(len(colors) - 1).bit_length())
    tsize = 1 << bits
    palette = np.zeros((tsize, 3), dtype=np.uint8)
    palette[:len(colors)] = colors
    idx_frames = inverse.astype(np.uint8).reshape(n, h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette.tobytes()
    if n > 1:
        # NETSCAPE loop extension (loop forever) — the de-facto
        # standard animation marker, also exercises app-ext skipping
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, bits)
    for fi in range(n):
        delay = (delays_ms[fi] if delays_ms else 0) // 10
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay, 0) \
            + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        grid = idx_frames[fi]
        if interlace:
            grid = grid[_deinterlace_rows(h)]
        out.append(mcs)
        lzw = _lzw_encode(mcs, grid.tobytes())
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
