"""Pure-stdlib PNG codec (zlib + struct) — the real image kernel.

The container ships no image libraries (PIL/cv2), but PNG needs none:
DEFLATE is ``zlib``, the container format is ``struct``, and the five
scanline filters (RFC 2083 / PNG spec §6) are byte arithmetic.  This
module turns the multimodal decode/resize stubs into real kernels for
PNG payloads while every other format stays the clearly-marked
NotImplementedError integration point.

Supported: bit depth 8, color types 0 (grayscale), 2 (RGB), 3
(palette, expanded to RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced.
16-bit depths and Adam7 interlacing raise ``PngError`` — the decode
kernels surface that per row as a ``decode_error:*`` status instead of
failing the batch (corrupt web images must never abort a 100 TB scan).

The encoder exists for fixture synthesis and the resize path; it can
write any of the five filter types per scanline, so tests round-trip
every filter's unfilter logic.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# decode budget for untrusted headers (matches jpeg.py / bmp.py): a
# corrupt web payload must never demand a multi-GB buffer
MAX_PIXELS = 1 << 26


class PngError(ValueError):
    """Malformed or unsupported PNG input."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(data: bytes):
    if data[:8] != PNG_SIGNATURE:
        raise PngError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError(f"truncated {ctype!r} chunk")
        crc = data[pos + 8 + length:pos + 12 + length]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != zlib.crc32(
                ctype + body) & 0xFFFFFFFF:
            raise PngError(f"bad CRC on {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters.  ``bpp`` = bytes per pixel."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise PngError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev_off = -stride
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        line = raw[pos + 1:pos + 1 + stride]
        pos += 1 + stride
        off = prev_off + stride
        if ft == 0:
            out[off:off + stride] = line
        elif ft == 1:  # Sub
            for x in range(stride):
                left = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (line[x] + left) & 0xFF
        elif ft == 2:  # Up
            if prev_off < 0:
                out[off:off + stride] = line
            else:
                for x in range(stride):
                    out[off + x] = (line[x] + out[prev_off + x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = out[off + x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if prev_off >= 0 else 0
                out[off + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                left = out[off + x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if prev_off >= 0 else 0
                ul = out[prev_off + x - bpp] if (prev_off >= 0
                                                 and x >= bpp) else 0
                out[off + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ft}")
        prev_off = off
    return out


def decode_png(data: bytes):
    """``png bytes -> (width, height, n_channels, pixels)``.

    ``pixels`` is the row-major interleaved 8-bit buffer; palette
    images are expanded to RGB (n_channels 3)."""
    ihdr = None
    plte = None
    idat = []
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or len(ihdr) != 13:
        raise PngError("missing/short IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if not (0 < width < 1 << 24 and 0 < height < 1 << 24):
        raise PngError("bad dimensions")
    # hostile-header cap (same 1<<26 budget as jpeg/bmp): a small
    # crafted file must not be able to demand a multi-GB buffer
    if width * height > MAX_PIXELS:
        raise PngError(f"image too large ({width}x{height})")
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth}")
    if ctype_n not in _CHANNELS:
        raise PngError(f"unsupported color type {ctype_n}")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace != 0:
        raise PngError("interlaced PNG unsupported")
    if not idat:
        raise PngError("no IDAT data")
    ch = _CHANNELS[ctype_n]
    # bounded inflate: the filtered stream is exactly (1 + w*ch) bytes
    # per row, so cap decompression there instead of letting a zlib
    # bomb inflate unbounded before the size check
    expected = (1 + width * ch) * height
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected)
        # leftover compressed input lives in unconsumed_tail per the
        # zlib contract; probing decompress(b"", 1) alone relies on
        # undocumented CPython behavior at block boundaries
        if dec.unconsumed_tail or dec.decompress(
                dec.unconsumed_tail or b"", 1):
            raise PngError("IDAT larger than the image geometry")
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    pixels = _unfilter(raw, width, height, ch)
    if ctype_n == 3:
        if plte is None or len(plte) % 3:
            raise PngError("palette image without valid PLTE")
        rgb = bytearray(len(pixels) * 3)
        n_entries = len(plte) // 3
        for i, idx in enumerate(pixels):
            if idx >= n_entries:
                raise PngError("palette index out of range")
            rgb[3 * i:3 * i + 3] = plte[3 * idx:3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(pixels)


def _filter_line(ft: int, line: bytes, prev: bytes | None,
                 bpp: int) -> bytes:
    if ft == 0:
        return line
    out = bytearray(len(line))
    for x in range(len(line)):
        left = line[x - bpp] if x >= bpp else 0
        up = prev[x] if prev is not None else 0
        ul = prev[x - bpp] if (prev is not None and x >= bpp) else 0
        if ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        elif ft == 4:
            pred = _paeth(left, up, ul)
        else:
            raise PngError(f"unknown filter type {ft}")
        out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def encode_png(width: int, height: int, n_channels: int, pixels: bytes,
               filters=None) -> bytes:
    """Minimal deterministic encoder (fixed zlib level 6, one IDAT).
    ``filters``: per-row filter type list (default all 0) — lets tests
    synthesize images exercising every unfilter branch."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(n_channels)
    if ctype is None:
        raise PngError(f"cannot encode {n_channels}-channel image")
    stride = width * n_channels
    if len(pixels) != stride * height:
        raise PngError("pixel buffer size mismatch")
    rows = []
    prev = None
    for y in range(height):
        ft = filters[y % len(filters)] if filters else 0
        line = pixels[y * stride:(y + 1) * stride]
        rows.append(bytes([ft]) + _filter_line(ft, line, prev, n_channels))
        prev = line
    raw = zlib.compress(b"".join(rows), 6)

    def chunk(ctype_b: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype_b + body
                + struct.pack(">I", zlib.crc32(ctype_b + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
            + chunk(b"IEND", b""))


def resize_nearest(pixels: bytes, width: int, height: int,
                   n_channels: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of an interleaved 8-bit buffer."""
    if out_w <= 0 or out_h <= 0:
        raise PngError("bad target size")
    out = bytearray(out_w * out_h * n_channels)
    for oy in range(out_h):
        sy = oy * height // out_h
        src_row = sy * width * n_channels
        dst_row = oy * out_w * n_channels
        for ox in range(out_w):
            sx = ox * width // out_w
            s = src_row + sx * n_channels
            d = dst_row + ox * n_channels
            out[d:d + n_channels] = pixels[s:s + n_channels]
    return bytes(out)


def features_from_pixels(pixels: bytes, n_channels: int,
                         feature_dim: int) -> list[float]:
    """Per-channel mean then per-channel population std, /255, padded
    with zeros / truncated to ``feature_dim`` — a deterministic,
    library-free feature vector for the decode pipeline."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, n_channels)
    means = arr.mean(axis=0) / 255.0
    stds = arr.std(axis=0) / 255.0
    feats = list(means) + list(stds)
    feats = feats[:feature_dim]
    return [float(f) for f in feats] + [0.0] * (feature_dim - len(feats))
