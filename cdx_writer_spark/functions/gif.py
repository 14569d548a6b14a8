"""Pure-stdlib GIF codec (struct + hand LZW) — the real frames kernel.

Like :mod:`.png`, the bread-and-butter web animation container needs
no external library: GIF87a/89a framing is ``struct``, and GIF-LZW is
~60 lines of table-driven decoding.  This turns the frame-sampling
stub (`multimodal.sample_frames`) into a REAL kernel for GIF payloads
— an animated GIF is the one honest multi-frame "video" this
container can decode — while every other video format stays the
clearly-marked NotImplementedError integration point.

Supported: GIF87a and GIF89a, global and local color tables, multiple
image frames (animation), extension blocks (skipped), interlaced
frames (row-reordered per spec), deferred-clear full dictionaries.
Frames are decoded independently onto their own rectangle; disposal
composition is out of scope (frame features are per-rectangle, which
is what a sampling pipeline wants anyway).

The encoder exists for fixture synthesis: it writes valid multi-frame
GIFs using literal-only LZW (a CLEAR code re-issued before the code
width would grow), so the decoder's variable-width code reader and
dictionary growth are exercised by round-trip tests against known
pixels.

Malformed input raises :class:`GifError`; the Spark kernels surface it
per row — a corrupt web payload must never abort a 100 TB scan.
"""

from __future__ import annotations

import struct

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

_MAX_CODE_WIDTH = 12

# decode budget for untrusted headers (matches png/jpeg/bmp): a
# crafted frame header must never demand a multi-GB buffer
MAX_PIXELS = 1 << 26


class GifError(ValueError):
    """Malformed or unsupported GIF input."""


class _ByteReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise GifError("truncated GIF")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def sub_blocks(self) -> bytes:
        """Concatenate data sub-blocks up to the 0x00 terminator."""
        chunks = []
        while True:
            n = self.u8()
            if n == 0:
                return b"".join(chunks)
            chunks.append(self.read(n))


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF-LZW: variable-width codes read LSB-first, dictionary rebuilt
    on CLEAR, growth capped at 12 bits (further codes reuse the full
    table until the encoder clears — the 'deferred clear' case)."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table, width = reset()
                prev = None
                continue
            if code == end:
                if len(out) < n_expected:
                    raise GifError("LZW ended before the frame filled")
                return bytes(out[:n_expected])
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise GifError(f"LZW code {code} out of range")
            out += entry
            if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
                table.append(prev + entry[:1])
                if (len(table) == (1 << width)
                        and width < _MAX_CODE_WIDTH):
                    width += 1
            prev = entry
            if len(out) >= n_expected:
                return bytes(out[:n_expected])
    raise GifError("LZW stream ran out before the end code")


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    ordered: list[bytes | None] = [None] * height
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            ordered[y] = rows[i]
            i += 1
    return ordered  # type: ignore[return-value]


def decode_gif(data: bytes) -> tuple[int, int, list[dict]]:
    """Decode every frame: ``(screen_w, screen_h, frames)`` where each
    frame dict has ``x, y, width, height, rgb`` (bytes, 3 per pixel,
    palette applied, row-major)."""
    r = _ByteReader(data)
    if r.read(6) not in GIF_SIGNATURES:
        raise GifError("bad GIF signature")
    screen_w, screen_h = r.u16(), r.u16()
    packed = r.u8()
    r.read(2)  # background color index + pixel aspect ratio
    global_table = b""
    if packed & 0x80:
        global_table = r.read(3 * (2 << (packed & 0x07)))
    frames: list[dict] = []
    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            r.u8()
            r.sub_blocks()
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        x, y, w, h = r.u16(), r.u16(), r.u16(), r.u16()
        fpacked = r.u8()
        table = global_table
        if fpacked & 0x80:
            table = r.read(3 * (2 << (fpacked & 0x07)))
        if not table:
            raise GifError("frame has no color table")
        if w == 0 or h == 0:
            raise GifError("zero-sized frame")
        # hostile-header cap (matches png/jpeg/bmp MAX_PIXELS): the
        # LZW expansion below is bounded by w*h, so bound w*h — a
        # crafted u16xu16 frame may otherwise demand ~12 GB
        if w * h > MAX_PIXELS:
            raise GifError(f"frame too large ({w}x{h})")
        min_code = r.u8()
        indices = _lzw_decode(min_code, r.sub_blocks(), w * h)
        rows = [indices[i * w:(i + 1) * w] for i in range(h)]
        if fpacked & 0x40:
            rows = _deinterlace(rows, h)
        n_colors = len(table) // 3
        rgb = bytearray()
        for row in rows:
            for v in row:
                if v >= n_colors:
                    raise GifError(f"palette index {v} out of range")
                rgb += table[3 * v:3 * v + 3]
        frames.append({"x": x, "y": y, "width": w, "height": h,
                       "rgb": bytes(rgb)})
    if not frames:
        raise GifError("GIF contains no frames")
    return screen_w, screen_h, frames


# --- encoder (fixture synthesis) --------------------------------------------

def _lzw_encode_literal(indices: bytes, min_code_size: int) -> bytes:
    """Literal-only GIF-LZW: every pixel is emitted as its own code,
    with CLEAR re-issued before the dictionary would force a width
    increase — valid output any decoder accepts, and it exercises the
    reader's CLEAR/width machinery without a compressor."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # after a CLEAR the table has clear+2 entries; each emitted literal
    # (from the second onward) adds one — stay strictly below 2^width
    span = (1 << width) - clear - 3
    out = bytearray()
    acc = bits = 0

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    for i, v in enumerate(indices):
        if i and i % span == 0:
            emit(clear)
        emit(v)
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[tuple[int, int, bytes]],
               palette: bytes | None = None) -> bytes:
    """Multi-frame GIF89a from ``(width, height, indices)`` frames over
    one global 256-color table (default: grayscale ramp i -> (i,i,i),
    which makes pixel luma == palette index — the exact-integer trick
    the oracle-checked queries rely on)."""
    if palette is None:
        palette = bytes(v for i in range(256) for v in (i, i, i))
    if len(palette) != 3 * 256:
        raise ValueError("palette must be 256 RGB entries")
    if not frames:
        raise ValueError("need at least one frame")
    screen_w = max(w for w, _, _ in frames)
    screen_h = max(h for _, h, _ in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", screen_w, screen_h)
    out += bytes([0x80 | 0x07, 0, 0])  # global table, 256 entries
    out += palette
    for w, h, indices in frames:
        if len(indices) != w * h:
            raise ValueError("indices size mismatch")
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(8)  # LZW min code size
        data = _lzw_encode_literal(indices, 8)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3B"
    return bytes(out)


def synth_gif_bytes(doc_id: int) -> bytes:
    """Deterministic animated-GIF fixture: ``2 + doc_id % 4`` frames of
    ``(8 + doc_id % 5) x (6 + doc_id % 3)`` pixels, pixel (f, y, x) =
    ``(doc_id * 7 + f * 13 + (y * w + x) * 3) % 256`` over the
    grayscale palette — pure integer arithmetic a SQL oracle reproduces
    exactly (palette index == luma byte)."""
    n_frames = 2 + doc_id % 4
    w, h = 8 + doc_id % 5, 6 + doc_id % 3
    frames = []
    for f in range(n_frames):
        idx = bytes((doc_id * 7 + f * 13 + p * 3) % 256
                    for p in range(w * h))
        frames.append((w, h, idx))
    return encode_gif(frames)
