"""Pure-stdlib AVI (RIFF) container mux/demux for MJPEG video columns.

The video analogue of ``stages/jpeg.py``: no external library, real spec
behavior.  AVI is the canonical Motion-JPEG container — each video frame is
a complete baseline JPEG in a ``00dc`` chunk inside the ``movi`` LIST, so
the in-repo JPEG codec (``stages/jpeg.py``) gives a genuinely decodable
video path: demux → per-frame JPEG decode → pixels.

Scope (documented, like the image/audio codecs):

- ``encode_avi_mjpeg``: frames (uint8 RGB/gray arrays) → a spec-compliant
  single-stream AVI with ``hdrl`` (avih + strl/strh/strf), ``movi`` and an
  ``idx1`` keyframe index — playable by real players, and the fixture
  generator for the decoder's tests (same strategy as ``encode_png`` /
  ``encode_jpeg``: the demuxer is tested against real container layouts).
- ``demux_avi``: RIFF walk → ``VideoInfo`` (fps, frame count, dimensions)
  + the list of per-frame JPEG payloads.  Tolerates a missing ``idx1``
  (index-less AVIs are legal), word-aligned chunk padding, and both
  ``00dc`` (compressed) and ``00db`` (uncompressed-flagged) frame tags.
- anything that is not RIFF/AVI, or a non-MJPEG video stream (H.264 in
  MP4, VP9 in WebM, …) raises ``ValueError`` / ``NotImplementedError`` at
  the documented integration point — swap in PyAV/ffmpeg there; those
  libraries are absent in this container.

Reference parity note: the reference engine has no media path at all
(SURVEY.md §2); this module is part of the training-data-pipeline surface
the build brief adds on top.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = ["VideoInfo", "encode_avi_mjpeg", "demux_avi"]


@dataclass(frozen=True)
class VideoInfo:
    width: int
    height: int
    fps: float
    n_frames: int
    codec: str  # fourcc, e.g. "MJPG"


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: float = 10.0,
                     quality_tables: bool = True) -> bytes:
    """uint8 frames (h, w[, 3]) → single-stream MJPEG AVI payload.

    Every frame is encoded with the in-repo baseline-JPEG encoder (all
    frames must share one (h, w)); ``fps`` is stored as a rate/scale
    rational (rate = round(fps·1000), scale = 1000) so non-integer rates
    round-trip.  The ``idx1`` index marks every frame a keyframe — true
    for MJPEG, and what seek-capable players expect."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("encode_avi_mjpeg: all frames must share one "
                             f"size, got {f.shape[:2]} vs {(h, w)}")
        payloads.append(encode_jpeg(f))

    rate, scale = int(round(fps * 1000)), 1000
    us_per_frame = int(round(1_000_000 * scale / rate))
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * int(round(fps)) or max_bytes, 0,
        0x10,                      # AVIF_HASINDEX
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
                          len(payloads), max_bytes, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        # idx1 offsets are relative to the start of 'movi' (the fourcc)
        idx_entries.append((len(movi_body) - 4 + 4, len(p)))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in [pos, end)."""
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated AVI chunk")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def demux_avi(payload: bytes) -> tuple[VideoInfo, list[bytes]]:
    """RIFF/AVI payload → (VideoInfo, per-frame JPEG payloads).

    Raises ValueError for non-AVI payloads and NotImplementedError for
    AVI streams whose video codec is not MJPEG (the PyAV/ffmpeg
    integration point)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or \
            payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps, n_declared, w, h, codec = 0.0, 0, 0, 0, ""
    frames: list[bytes] = []

    def scan(pos: int, end: int):
        nonlocal fps, n_declared, w, h, codec
        for fourcc, body, size in _walk(payload, pos, end):
            if fourcc == b"LIST":
                scan(body + 4, body + size)  # skip the list-type fourcc
            elif fourcc == b"avih" and size >= 56:
                vals = struct.unpack("<14I", payload[body:body + 56])
                n_declared = vals[4]
                w, h = w or vals[8], h or vals[9]
            elif fourcc == b"strh" and size >= 48:
                if payload[body:body + 4] == b"vids":
                    codec = payload[body + 4:body + 8].decode(
                        "ascii", "replace").strip("\x00 ")
                    scale, rate = struct.unpack(
                        "<II", payload[body + 20:body + 28])
                    if scale:
                        fps = rate / scale
            elif fourcc == b"strf" and size >= 40 and not (w and h):
                _, bw, bh = struct.unpack("<Iii", payload[body:body + 12])
                w, h = bw, abs(bh)
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(payload[body:body + size])

    scan(12, len(payload))
    if codec and codec.upper() not in ("MJPG", "MJPEG", "JPEG"):
        raise NotImplementedError(
            f"AVI video codec {codec!r} needs a real decoder — PyAV/ffmpeg "
            "integration point (MJPEG demuxes and decodes for real)")
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return VideoInfo(width=w, height=h, fps=fps or 0.0,
                     n_frames=len(frames), codec=codec or "MJPG"), frames
