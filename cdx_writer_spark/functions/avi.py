"""Minimal MJPEG-in-AVI container codec — stdlib ``struct`` only.

The seventh real codec: a RIFF/AVI parser that extracts the Motion-
JPEG frame stream (``00dc``/``00db`` chunks under ``LIST movi``) and
the declared geometry (``avih``), handing each frame to the baseline
JPEG decoder in :mod:`.jpeg`.  This makes the VIDEO modality real at
the container level: frame sampling over AVI files decodes actual
compressed frames instead of the hash-chain fake, with no ffmpeg/cv2
dependency (neither exists in this environment; real pipelines swap a
libav binding in at the same kernel seam for mp4/webm).

Format notes (public AVI spec, Microsoft "AVI RIFF File Reference"):
``RIFF <size> 'AVI '`` wrapping chunks; each chunk is
``fourcc u32le-size payload`` padded to even length; ``LIST`` chunks
carry a subtype fourcc then nested chunks.  ``LIST hdrl`` holds the
``avih`` main header (us/frame @0, total frames @16, width @32,
height @36); ``LIST movi`` holds the frame stream.  The optional
``idx1`` index is ignored — the parser stream-scans ``movi``, which
also handles files whose index is missing or lies.

Hostile-input budget (same policy as the other codecs): declared
sizes are bounds-checked against the buffer, the frame count is
capped, and every malformed structure raises :class:`AviError` only —
the Spark kernels turn that into per-row status, never a batch abort.
"""

from __future__ import annotations

import struct

# a hostile header can declare millions of zero-byte frames; cap what
# the pure-Python path will attempt
MAX_FRAMES = 4096


class AviError(ValueError):
    pass


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and \
        data[8:12] == b"AVI "


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a chunk
    span; malformed sizes raise."""
    off = start
    while off < end:
        if off + 8 > end:
            raise AviError(f"truncated chunk header at {off}")
        fourcc = data[off:off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        body = off + 8
        if body + size > end:
            raise AviError(
                f"chunk {fourcc!r} declares {size} bytes past the end")
        yield fourcc, body, size
        off = body + size + (size & 1)


def parse_avi(data: bytes):
    """Parse an MJPEG AVI: ``(width, height, us_per_frame, frames)``
    with ``frames`` the list of raw JPEG byte strings in stream order.
    Raises :class:`AviError` on anything malformed."""
    if not is_avi(data):
        raise AviError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    width = height = us_per_frame = None
    frames: list[bytes] = []
    for fourcc, body, size in _chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        subtype = data[body:body + 4]
        if subtype == b"hdrl":
            for fc2, b2, s2 in _chunks(data, body + 4, body + size):
                if fc2 == b"avih":
                    if s2 < 40:
                        raise AviError("avih header too short")
                    (us_per_frame,) = struct.unpack_from("<I", data, b2)
                    width, height = struct.unpack_from(
                        "<II", data, b2 + 32)
        elif subtype == b"movi":
            for fc2, b2, s2 in _chunks(data, body + 4, body + size):
                if fc2[2:4] not in (b"dc", b"db"):
                    continue
                if len(frames) >= MAX_FRAMES:
                    raise AviError(f"more than {MAX_FRAMES} frames")
                frame = data[b2:b2 + s2]
                if not frame.startswith(b"\xFF\xD8"):
                    raise AviError(
                        f"frame {len(frames)} is not JPEG data")
                frames.append(frame)
    if width is None:
        raise AviError("missing avih header")
    if not frames:
        raise AviError("no frame chunks in movi")
    return int(width), int(height), int(us_per_frame), frames


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(subtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", subtype + payload)


def encode_mjpeg_avi(frames, width: int, height: int,
                     us_per_frame: int = 40000) -> bytes:
    """Minimal valid MJPEG AVI wrapping ``frames`` (raw JPEG byte
    strings): avih + one 'vids'/'MJPG' stream + movi.  No idx1 — the
    parser (and most real ones) stream-scan."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0)
    # dwScale=us_per_frame, dwRate=1e6 -> fps = dwRate/dwScale (the
    # strh pair is (scale, rate) in that order; swapping them declares
    # 0.04 fps instead of 25 to players that honor strh over avih)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, us_per_frame, 1_000_000,
        0, len(frames), 0, 0xFFFFFFFF, 0, 0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi",
                 b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_avi_bytes(doc_id: int) -> bytes:
    """Deterministic MJPEG-AVI fixture: ``1 + doc_id % 4`` grayscale
    JPEG frames of ``(2 + doc_id % 3) x (1 + doc_id % 2)`` constant
    blocks, block (bx, by) of frame f valued
    ``(doc_id * 11 + f * 47 + (by * bw + bx) * 29) % 256`` — integer
    arithmetic a SQL oracle reproduces, losslessly encoded (unit
    quantizers, DC-only blocks — see
    :func:`.jpeg.encode_gray_blocks_jpeg`)."""
    from . import jpeg as jpeglib

    bw, bh = 2 + doc_id % 3, 1 + doc_id % 2
    n_frames = 1 + doc_id % 4
    frames = []
    for f in range(n_frames):
        vals = [[(doc_id * 11 + f * 47 + (by * bw + bx) * 29) % 256
                 for bx in range(bw)] for by in range(bh)]
        frames.append(jpeglib.encode_gray_blocks_jpeg(bw, bh, vals))
    return encode_mjpeg_avi(frames, 8 * bw, 8 * bh)
