"""Pure-stdlib baseline TIFF codec (struct only): uncompressed strips,
8-bit grayscale / RGB / RGBA, chunky planar layout, both byte orders.

Scope mirrors the other stdlib codecs (png/gif/jpeg/bmp): the common
web/archival baseline, decoded for REAL with no third-party libs, and
hard failures (``TiffError``) for everything else (LZW/JPEG-compressed
TIFFs, 16-bit, tiled, planar=2) — the Spark kernels surface those as
per-row ``decode_error:*`` statuses, never stage aborts.

Reference behavior cross-checked against the TIFF 6.0 specification
(Adobe, 1992): II/MM headers, IFD walking, inline-vs-offset tag
values, strip assembly via StripOffsets/StripByteCounts/RowsPerStrip.
"""

from __future__ import annotations

import struct

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

# decode budget for untrusted headers (matches png/gif/jpeg/bmp)
MAX_PIXELS = 1 << 26

# tag ids
_WIDTH, _LENGTH, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP = 262, 273, 277
_ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR = 278, 279, 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4}   # BYTE, ASCII, SHORT, LONG


class TiffError(ValueError):
    pass


def _read_ifd_values(data: bytes, endian: str, vtype: int, count: int,
                     raw: bytes) -> list[int]:
    """Tag values: inline when they fit in the 4-byte field, else at
    the offset the field holds."""
    size = _TYPE_SIZES.get(vtype)
    if size is None:
        raise TiffError(f"unsupported tag value type {vtype}")
    if count < 1:
        # a required tag declaring count=0 would otherwise surface as
        # an IndexError in one() instead of the typed per-row error
        raise TiffError("tag declares zero values")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        if off + total > len(data):
            raise TiffError("tag value offset out of bounds")
        buf = data[off:off + total]
    fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[vtype]
    return list(struct.unpack(endian + fmt * count, buf))


def decode_tiff(data: bytes):
    """``tiff bytes -> (width, height, n_channels, pixels)`` with
    ``pixels`` the row-major interleaved 8-bit buffer."""
    if len(data) < 8 or data[:4] not in TIFF_MAGICS:
        raise TiffError("bad TIFF signature")
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise TiffError("IFD offset out of bounds")
    (n_entries,) = struct.unpack(endian + "H",
                                 data[ifd_off:ifd_off + 2])
    if ifd_off + 2 + 12 * n_entries > len(data):
        raise TiffError("truncated IFD")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, vtype, count = struct.unpack(endian + "HHI",
                                          data[off:off + 8])
        try:
            tags[tag] = _read_ifd_values(data, endian, vtype, count,
                                         data[off + 8:off + 12])
        except TiffError:
            if tag in (_WIDTH, _LENGTH, _BITS, _COMPRESSION,
                       _PHOTOMETRIC, _STRIP_OFFSETS, _SPP,
                       _ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR):
                raise
            # unknown tag with an exotic value type: skippable

    def one(tag: int, default: int | None = None) -> int:
        vals = tags.get(tag)
        if not vals:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return vals[0]

    width, height = one(_WIDTH), one(_LENGTH)
    if width <= 0 or height <= 0:
        raise TiffError("bad dimensions")
    if width * height > MAX_PIXELS:
        raise TiffError(f"image too large ({width}x{height})")
    if one(_COMPRESSION, 1) != 1:
        raise TiffError("compressed TIFF unsupported "
                        f"(compression {one(_COMPRESSION, 1)})")
    if one(_PLANAR, 1) != 1:
        raise TiffError("planar TIFF unsupported")
    spp = one(_SPP, 1)
    photometric = one(_PHOTOMETRIC)
    if photometric not in (1, 2) or spp not in (1, 3, 4):
        raise TiffError(
            f"unsupported photometric {photometric}/spp {spp}")
    if photometric == 2 and spp < 3:
        raise TiffError("RGB photometric needs >= 3 samples")
    bits = tags.get(_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise TiffError(f"unsupported bit depths {bits}")
    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing/mismatched strip tables")
    rows_per_strip = one(_ROWS_PER_STRIP, height)
    if rows_per_strip <= 0:
        raise TiffError("bad RowsPerStrip")
    row_bytes = width * spp
    pixels = bytearray()
    rows_done = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise TiffError(f"strip {si} out of bounds")
        rows_here = min(rows_per_strip, height - rows_done)
        if cnt != rows_here * row_bytes:
            raise TiffError(
                f"strip {si} holds {cnt} bytes, geometry needs "
                f"{rows_here * row_bytes}")
        pixels += data[off:off + cnt]
        rows_done += rows_here
    if rows_done != height:
        raise TiffError(
            f"strips cover {rows_done} rows, image has {height}")
    return width, height, spp, bytes(pixels)


def encode_tiff(width: int, height: int, n_channels: int,
                pixels: bytes, big_endian: bool = False,
                rows_per_strip: int | None = None) -> bytes:
    """Minimal uncompressed chunky TIFF writer (the decoder's test
    partner and fixture generator)."""
    if n_channels not in (1, 3, 4):
        raise TiffError(f"unsupported channel count {n_channels}")
    if len(pixels) != width * height * n_channels:
        raise TiffError("pixel buffer does not match dimensions")
    endian = ">" if big_endian else "<"
    rps = rows_per_strip or height
    row_bytes = width * n_channels
    strips = []
    r = 0
    while r < height:
        rows_here = min(rps, height - r)
        strips.append(pixels[r * row_bytes:(r + rows_here) * row_bytes])
        r += rows_here
    photometric = 1 if n_channels == 1 else 2

    entries = []   # (tag, vtype, count, values)
    entries.append((_WIDTH, 4, 1, [width]))
    entries.append((_LENGTH, 4, 1, [height]))
    entries.append((_BITS, 3, n_channels, [8] * n_channels))
    entries.append((_COMPRESSION, 3, 1, [1]))
    entries.append((_PHOTOMETRIC, 3, 1, [photometric]))
    entries.append((_STRIP_OFFSETS, 4, len(strips), None))  # patched
    entries.append((_SPP, 3, 1, [n_channels]))
    entries.append((_ROWS_PER_STRIP, 4, 1, [rps]))
    entries.append((_STRIP_COUNTS, 4, len(strips),
                    [len(s) for s in strips]))
    entries.append((_PLANAR, 3, 1, [1]))

    header = (b"MM\x00*" if big_endian else b"II*\x00") \
        + struct.pack(endian + "I", 8)
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # overflow area for tag values wider than 4 bytes
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_field(vtype, count, values):
        size = _TYPE_SIZES[vtype] * count
        fmt = {3: "H", 4: "I"}[vtype]
        packed = struct.pack(endian + fmt * count, *values)
        if size <= 4:
            return packed + b"\x00" * (4 - size), None
        off = overflow_off + len(overflow)
        overflow.extend(packed)
        return struct.pack(endian + "I", off), off

    # first pass to size the overflow so strip data lands after it
    sized = []
    for tag, vtype, count, values in entries:
        if values is None:
            values = [0] * count
        field, _ = value_field(vtype, count, values)
        sized.append((tag, vtype, count, values, field))
    data_off = overflow_off + len(overflow)
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # second pass with the real strip offsets
    overflow = bytearray()
    out_entries = b""
    for tag, vtype, count, values, _ in sized:
        if tag == _STRIP_OFFSETS:
            values = strip_offsets
        field, _ = value_field(vtype, count, values)
        out_entries += struct.pack(endian + "HHI", tag, vtype, count) \
            + field
    ifd = struct.pack(endian + "H", len(entries)) + out_entries \
        + struct.pack(endian + "I", 0)
    return header + ifd + bytes(overflow) + b"".join(strips)


def synth_tiff_bytes(doc_id: int) -> bytes:
    """Deterministic small test TIFF (size, channels, byte order and
    strip split vary by id)."""
    w, h = 3 + doc_id % 5, 2 + doc_id % 4
    nch = (1, 3, 4)[doc_id % 3]
    pix = bytes((doc_id * 23 + i * 31) % 256
                for i in range(w * h * nch))
    return encode_tiff(w, h, nch, pix, big_endian=(doc_id % 2 == 1),
                       rows_per_strip=(1 + doc_id % 3))
