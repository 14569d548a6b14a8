"""Pure-stdlib BMP decoder (uncompressed 24/32-bit DIBs).

Windows bitmaps still appear in web crawls; the common on-disk shape —
BITMAPINFOHEADER (or the V4/V5 supersets, whose 40-byte prefix is
identical), BI_RGB uncompressed, 24- or 32-bit, bottom-up or top-down —
is just padded BGR(A) rows, so a correct decoder needs only ``struct``.
Palette, RLE and bitfield variants raise :class:`BmpError` (per-row
decode_error in the Spark kernels); genuinely exotic formats stay
behind the env-blocked NotImplementedError seam in
:mod:`.multimodal`.

Reference parity note: the reference CDX writer never decodes images
(cdx_writer.py treats payloads as opaque bytes); this module belongs
to the LLM-training-data tier the build mandates on top.
"""
from __future__ import annotations

import struct

BMP_MAGIC = b"BM"


class BmpError(ValueError):
    pass


def decode_bmp(data: bytes):
    """Decode an uncompressed 24/32-bit BMP: ``(width, height,
    n_channels, pixels)`` — row-major top-down, interleaved RGB or
    RGBA (BGR(A) source order swapped).  Malformed or unsupported
    input raises :class:`BmpError` only."""
    try:
        return _decode_checked(data)
    except BmpError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise BmpError(f"malformed BMP ({type(e).__name__}: {e})") from e


def _decode_checked(data: bytes):
    if not data.startswith(BMP_MAGIC):
        raise BmpError("bad BMP signature")
    if len(data) < 54:
        raise BmpError("truncated BMP header")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if planes != 1:
        raise BmpError(f"bad plane count {planes}")
    if compression != 0:
        raise BmpError(f"unsupported compression {compression} "
                       "(only BI_RGB)")
    if bpp not in (24, 32):
        raise BmpError(f"unsupported bit depth {bpp}")
    if w <= 0 or h == 0:
        raise BmpError(f"bad dimensions {w}x{h}")
    top_down = h < 0
    h = abs(h)
    if w * h > 1 << 26:
        raise BmpError(f"image too large ({w}x{h})")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    need = pix_off + stride * h
    if pix_off < 14 + hdr_size or len(data) < need:
        raise BmpError("truncated pixel data")
    out = bytearray(w * h * nch)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        src = pix_off + src_row * stride
        dst = row * w * nch
        line = data[src:src + w * nch]
        if nch == 3:
            # BGR -> RGB
            out[dst:dst + w * 3] = line
            out[dst:dst + w * 3:3] = line[2::3]
            out[dst + 2:dst + w * 3:3] = line[0::3]
        else:
            # BGRA -> RGBA
            out[dst:dst + w * 4] = line
            out[dst:dst + w * 4:4] = line[2::4]
            out[dst + 2:dst + w * 4:4] = line[0::4]
    return w, h, nch, bytes(out)


def encode_bmp(width: int, height: int, n_channels: int,
               pixels: bytes) -> bytes:
    """Bottom-up BI_RGB BMP from row-major RGB(A) pixels (fixture
    synthesis + the deterministic other-half of the decoder's
    roundtrip test)."""
    if n_channels not in (3, 4):
        raise ValueError("BMP encoder supports 3 or 4 channels")
    if len(pixels) != width * height * n_channels:
        raise ValueError("pixel buffer size mismatch")
    stride = (width * n_channels + 3) & ~3
    pad = b"\x00" * (stride - width * n_channels)
    body = bytearray()
    for row in range(height - 1, -1, -1):
        line = bytearray(pixels[row * width * n_channels:
                                (row + 1) * width * n_channels])
        # RGB(A) -> BGR(A)
        line[0::n_channels], line[2::n_channels] = \
            line[2::n_channels], line[0::n_channels]
        body += line + pad
    hdr = struct.pack("<2sIHHI", BMP_MAGIC, 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1,
                      8 * n_channels, 0, len(body), 2835, 2835, 0, 0)
    return hdr + dib + bytes(body)


def synth_bmp_bytes(doc_id: int) -> bytes:
    """Deterministic small test BMP (size and pixels vary by id)."""
    w, h = 3 + doc_id % 4, 2 + doc_id % 3
    nch = 3 if doc_id % 2 == 0 else 4
    pix = bytes((doc_id * 17 + i * 29) % 256
                for i in range(w * h * nch))
    return encode_bmp(w, h, nch, pix)
