"""Pure-stdlib MP4 (ISO BMFF, MPEG-4 Part 12) demux/mux for JPEG video.

The second real video container next to ``stages/avi.py``: MP4 is the
ubiquitous box-tree format; with the ``'jpeg'`` sample-entry codec
(QuickTime Photo-JPEG — every sample a complete baseline JPEG) the in-repo
JPEG codec makes the whole demux→decode path genuinely functional without
any external library.

- ``demux_mp4``: walks the box tree (32-bit and 64-bit ``largesize``
  boxes), picks the first ``'vide'``-handler track, reads the sample
  tables — ``stsd`` (codec gate), ``stsz`` (sizes), ``stsc``
  (sample→chunk runs), ``stco``/``co64`` (chunk offsets), ``stts`` +
  ``mdhd`` timescale (fps) — and returns the per-sample JPEG payloads.
  Compressed codecs the sandbox cannot decode (``avc1``/H.264,
  ``hev1``/HEVC, ``vp09``, …) raise ``NotImplementedError`` at the
  documented PyAV/ffmpeg integration point; non-MP4 bytes raise
  ``ValueError``.
- ``encode_mp4_mjpeg``: a minimal valid single-track movie —
  ``ftyp`` + ``mdat`` (concatenated JPEG samples) + trailing ``moov``
  with the full ``stbl`` (absolute ``stco`` offsets into ``mdat``), so
  the demuxer is exercised against real sample-table layouts, the same
  fixture strategy as ``encode_png``/``encode_jpeg``/``encode_avi_mjpeg``.

Box layout notes the code relies on (ISO 14496-12): every box is
``[size:u32][type:4cc]`` with payload to ``size``; ``size==1`` switches to
a u64 ``largesize``; full boxes start with ``[version:u8][flags:u24]``;
``stsc`` runs are ``(first_chunk, samples_per_chunk, desc_id)`` with the
run ending at the NEXT entry's ``first_chunk``.
"""

from __future__ import annotations

import struct

import numpy as np

from .avi import VideoInfo

__all__ = ["demux_mp4", "encode_mp4_mjpeg"]

_JPEG_FOURCC = {"jpeg", "mjpa", "mjpb", "mjpg"}


def _walk(buf: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        btype = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:           # box extends to the end of the file
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("truncated MP4 box")
        yield btype, body, pos + size
        pos += size


def _find(buf: bytes, pos: int, end: int, *path: bytes):
    """Yield body ranges of every box matching the nested type path."""
    if not path:
        yield pos, end
        return
    for btype, body, bend in _walk(buf, pos, end):
        if btype == path[0]:
            yield from _find(buf, body, bend, *path[1:])


def demux_mp4(payload: bytes) -> tuple[VideoInfo, list[bytes]]:
    """MP4 payload → (VideoInfo, per-sample JPEG payloads)."""
    head = payload[4:8]
    if len(payload) < 12 or head != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 payload")
    for trak_s, trak_e in _find(payload, 0, len(payload), b"moov", b"trak"):
        mdia = list(_find(payload, trak_s, trak_e, b"mdia"))
        if not mdia:
            continue
        m_s, m_e = mdia[0]
        handler = None
        for h_s, h_e in _find(payload, m_s, m_e, b"hdlr"):
            handler = payload[h_s + 8:h_s + 12]
        if handler != b"vide":
            continue
        timescale = 0
        for d_s, _ in _find(payload, m_s, m_e, b"mdhd"):
            version = payload[d_s]
            off = d_s + (20 if version == 1 else 12)
            (timescale,) = struct.unpack(">I", payload[off:off + 4])
        stbl = list(_find(payload, m_s, m_e, b"minf", b"stbl"))
        if not stbl:
            continue
        s_s, s_e = stbl[0]
        codec, sizes, offsets, stsc, durations = None, None, None, [], []
        for btype, body, bend in _walk(payload, s_s, s_e):
            if btype == b"stsd":
                (n,) = struct.unpack(">I", payload[body + 4:body + 8])
                if n >= 1:
                    codec = payload[body + 12:body + 16].decode(
                        "ascii", "replace").lower()
            elif btype == b"stsz":
                uniform, count = struct.unpack(
                    ">II", payload[body + 4:body + 12])
                sizes = (np.full(count, uniform, dtype=np.int64) if uniform
                         else np.frombuffer(
                             payload, dtype=">u4", count=count,
                             offset=body + 12).astype(np.int64))
            elif btype in (b"stco", b"co64"):
                (count,) = struct.unpack(">I", payload[body + 4:body + 8])
                dt = ">u4" if btype == b"stco" else ">u8"
                offsets = np.frombuffer(payload, dtype=dt, count=count,
                                        offset=body + 8).astype(np.int64)
            elif btype == b"stsc":
                (count,) = struct.unpack(">I", payload[body + 4:body + 8])
                ent = np.frombuffer(payload, dtype=">u4", count=count * 3,
                                    offset=body + 8).astype(np.int64)
                stsc = ent.reshape(-1, 3)
            elif btype == b"stts":
                (count,) = struct.unpack(">I", payload[body + 4:body + 8])
                ent = np.frombuffer(payload, dtype=">u4", count=count * 2,
                                    offset=body + 8).astype(np.int64)
                durations = ent.reshape(-1, 2)
        if codec is None or sizes is None or offsets is None:
            raise ValueError("MP4 video track missing sample tables")
        if codec not in _JPEG_FOURCC:
            raise NotImplementedError(
                f"MP4 video codec {codec!r} needs a real decoder — "
                "PyAV/ffmpeg integration point (Photo-JPEG 'jpeg' tracks "
                "demux and decode for real)")
        frames: list[bytes] = []
        n_samples = int(sizes.size)
        si = 0
        for run_idx in range(len(stsc)):
            first_chunk = int(stsc[run_idx][0])
            per_chunk = int(stsc[run_idx][1])
            last_chunk = (int(stsc[run_idx + 1][0]) - 1
                          if run_idx + 1 < len(stsc) else len(offsets))
            for c in range(first_chunk, last_chunk + 1):
                off = int(offsets[c - 1])
                for _ in range(per_chunk):
                    if si >= n_samples:
                        break
                    frames.append(payload[off:off + int(sizes[si])])
                    off += int(sizes[si])
                    si += 1
        if si < n_samples:
            raise ValueError("MP4 sample tables inconsistent "
                             f"({si} of {n_samples} samples mapped)")
        fps = 0.0
        if len(durations) and timescale:
            total = int((durations[:, 0] * durations[:, 1]).sum())
            n_tt = int(durations[:, 0].sum())
            if total:
                fps = timescale * n_tt / total
        w = h = 0
        for t_s, t_e in _find(payload, trak_s, trak_e, b"tkhd"):
            version = payload[t_s]
            off = t_e - 8
            wfx, hfx = struct.unpack(">II", payload[off:off + 8])
            w, h = wfx >> 16, hfx >> 16
        return VideoInfo(width=w, height=h, fps=fps,
                         n_frames=len(frames), codec=codec), frames
    raise ValueError("MP4 contains no video track")


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body)


def encode_mp4_mjpeg(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """uint8 frames (h, w[, 3]) → single-track Photo-JPEG MP4 payload."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_mp4_mjpeg: need at least one frame")
    h, w = frames[0].shape[:2]
    samples = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("encode_mp4_mjpeg: all frames must share one "
                             f"size, got {f.shape[:2]} vs {(h, w)}")
        samples.append(encode_jpeg(f))

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    # stco offsets are absolute: one chunk holding every sample,
    # starting right after ftyp + the mdat header
    chunk_off = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    timescale = 90_000
    dur = int(round(timescale / fps)) if fps else timescale
    total = dur * len(samples)

    stsd_entry = _box(
        b"jpeg",
        bytes(6) + struct.pack(">H", 1)            # reserved + data-ref
        + bytes(16)                                 # pre-defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)    # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x0aPhoto-JPEG" + bytes(21)             # 32-byte pascal name
        + struct.pack(">HH", 24, 0xFFFF))           # depth, color table
    stsd = _full(b"stsd", struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", struct.pack(">III", 1, len(samples), dur))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, len(samples))
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    # dref with one self-contained 'url ' entry (flags=1)
    dinf = _box(b"dinf", _full(b"dref", struct.pack(">I", 1)
                               + struct.pack(">I", 12) + b"url "
                               + b"\x00\x00\x00\x01"))
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), version=0)
    vmhd = vmhd[:9] + b"\x00\x00\x01" + vmhd[12:]  # flags=1 per spec
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + bytes(12)
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, total,
                                      0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", struct.pack(">IIIIII", 0, 0, 1, 0, total, 0)
                 + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", w << 16, h << 16), version=0)
    tkhd = tkhd[:9] + b"\x00\x00\x07" + tkhd[12:]  # enabled|in-movie flags
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, timescale, total)
                 + struct.pack(">IH", 0x10000, 0x100) + bytes(10)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + bytes(24) + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
