"""Pure stdlib+numpy baseline JPEG codec.

The compressed-image integration point (`multimodal.py`) historically raised
``NotImplementedError`` for JPEG because no image library ships in this
container.  This module closes that gap for the mainline of the format the
same way ``decode_png`` did for PNG: a from-scratch decoder for **baseline
sequential DCT JPEG** (SOF0) — JFIF markers, quantization + Huffman tables
read from the stream (DQT/DHT), interleaved and single-component scans,
restart intervals, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, YCbCr→RGB
(BT.601) — plus an encoder producing real spec-compliant bitstreams so the
decoder is tested against genuinely entropy-coded data.

Design notes:

- The **decoder trusts only the stream**: quant tables arrive via DQT and
  Huffman tables via DHT, so any compliant baseline file decodes — including
  files written with the standard Annex-K tables by other encoders.
- The **encoder builds its own canonical Huffman tables** (all DC categories
  at code length 4, all AC run/size symbols at code length 8) and writes
  them into DHT.  This is valid per the spec (the all-ones code stays
  unused), trivially correct, and sidesteps hand-copying the 162-entry
  Annex-K tables; compression ratio is not the point — exercising the
  decoder's entropy/NEON-free path is.
- Entropy decoding is table-driven (the libjpeg strategy, r4): a
  vectorized 16-bit window array over the de-stuffed bitstream plus
  combined code+magnitude LUTs decode one coefficient per list access —
  ~8-30× the original per-bit loop; marker scan/de-stuffing is one numpy
  pass + ``bytes.replace``; nonzero coefficients scatter once per
  component; the IDCT runs as two batched BLAS matmuls.  Still a pure
  numpy/stdlib codec for the actor-pool media stages, not a libjpeg-turbo
  replacement — the stage-level integration point note in
  ``multimodal.py`` documents where a C-backed decoder would drop in.
- Progressive (SOF2), arithmetic coding, 12-bit precision and lossless
  modes raise ``ValueError`` → the caller's library integration point.

Reference parity note: the reference repo has no media path at all
(SURVEY.md §2.7 — multimodal columns are an addition this engine makes for
LLM-scale data pipelines).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# orthonormal 8-point DCT-II matrix: F = T @ f @ T.T, f = T.T @ F @ T
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# zigzag: _ZIG[i] = (row, col) of the i-th coefficient in scan order
_ZIG = []
for _s in range(15):
    _d = range(_s + 1)
    for _i in (_d if _s % 2 else reversed(_d)):
        _r, _c2 = _i, _s - _i
        if _r < 8 and _c2 < 8:
            _ZIG.append((_r, _c2))
_ZIG_ROWS = np.array([r for r, _ in _ZIG])
_ZIG_COLS = np.array([c for _, c in _ZIG])


# ============================================================== bit plumbing
class _BitReader:
    """MSB-first bit reader over entropy-coded bytes (stuffing removed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past the end: pad with 1s (spec padding convention) — a
                # truncated stream surfaces as a Huffman miss upstream
                return 1
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: map the s-bit magnitude field to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code (corrupt or truncated scan)")


def _build_huff(bits: list[int], vals: bytes) -> dict:
    """DHT (BITS, HUFFVAL) → {(length, canonical code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ------------------------------------------------- table-driven fast path
def _window16(seg: bytes) -> tuple[np.ndarray, int]:
    """All 16-bit MSB-first windows of the segment's bitstream:
    ``w[p]`` = bits p..p+15 as one uint16 — 16 vectorized shift-ors over
    the unpacked bit array, so every Huffman symbol (≤16 bits by spec) and
    every magnitude field resolves with ONE array read instead of a
    per-bit Python loop.  Padded with 64 one-bits (the spec's padding
    convention; the all-ones code is reserved, so overrunning a truncated
    stream still surfaces as a Huffman miss)."""
    b = np.frombuffer(seg + b"\xff" * 9, dtype=np.uint8).astype(np.uint32)
    n = 8 * len(seg) + 48
    nb = (n + 7) // 8
    # 24-bit window at each BYTE offset, then one shift per bit phase:
    # 8 vectorized passes over n/8-sized arrays instead of 16 over n.
    w24 = (b[:nb] << 16) | (b[1:nb + 1] << 8) | b[2:nb + 2]
    v = np.empty(nb * 8, dtype=np.uint16)
    for phase in range(8):
        v[phase::8] = ((w24 >> (8 - phase)) & 0xFFFF).astype(np.uint16)
    return v[:n], 8 * len(seg)


def _huff_lut(table: dict) -> list[int]:
    """Canonical table → 2^16 direct-indexed packed entries
    ``(symbol << 5) | code_length``: every 16-bit window whose prefix is
    code c maps to c's entry, so decode = one list index + two shifts.
    Entry 0 (length 0) marks an invalid prefix.  A plain Python list —
    int indexing stays off the numpy scalar-boxing path."""
    sym = np.zeros(65536, dtype=np.int32)
    ln = np.zeros(65536, dtype=np.int32)
    for (length, code), s in table.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    return ((sym << 5) | ln).tolist()


def _sym_len_arrays(table: dict) -> tuple[np.ndarray, np.ndarray]:
    sym = np.zeros(65536, dtype=np.int64)
    ln = np.zeros(65536, dtype=np.int64)
    for (length, code), s in table.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


def _fast_dc_lut(table: dict) -> list[int]:
    """Combined code+magnitude DC lookup: window → packed
    ``(total_bits << 13) | (extended_diff + 4096)`` when the whole
    (Huffman code, SSSS magnitude field) fits in 16 bits — ONE list
    access decodes the full DC difference.  0 = take the slow path
    (invalid prefix, or an unusually long code+field)."""
    sym, ln = _sym_len_arrays(table)
    total = ln + sym
    w = np.arange(65536, dtype=np.int64)
    sz = np.maximum(sym, 1)
    mag = (w >> np.maximum(16 - total, 0)) & ((1 << sz) - 1)
    ext = np.where(mag >= (1 << (sz - 1)), mag, mag - (1 << sz) + 1)
    ext = np.where(sym > 0, ext, 0)
    valid = (ln > 0) & (total <= 16) & (sym <= 11)
    packed = np.where(valid, (total << 13) | (ext + 4096), 0)
    return packed.tolist()


def _fast_ac_lut(table: dict) -> list[int]:
    """Combined AC lookup: window → packed
    ``(total_bits << 16) | (run << 12) | (extended_value + 2048)``;
    value field 2048 (i.e. 0) with run 0 = EOB, with run 15 = ZRL.
    0 = slow path."""
    sym, ln = _sym_len_arrays(table)
    size = sym & 15
    run = sym >> 4
    total = ln + size
    w = np.arange(65536, dtype=np.int64)
    sz = np.maximum(size, 1)
    mag = (w >> np.maximum(16 - total, 0)) & ((1 << sz) - 1)
    ext = np.where(mag >= (1 << (sz - 1)), mag, mag - (1 << sz) + 1)
    ext = np.where(size > 0, ext, 0)
    valid = (ln > 0) & (total <= 16) & (size <= 10)
    packed = np.where(valid, (total << 16) | (run << 12) | (ext + 2048), 0)
    return packed.tolist()


# ================================================================== decoder
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG → uint8 pixels, (h, w) gray or (h, w, 3) RGB.

    Raises ValueError on non-JPEG or non-baseline variants (progressive,
    12-bit, arithmetic) — the caller's library integration point.
    """
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None      # (h, w, [(cid, hs, vs, tq), ...])
    restart_interval = 0
    out_planes = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8
                                        ).astype(np.int32)
                    p += 64
                else:  # 16-bit entries
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2"
                                        ).astype(np.int32)
                    p += 128
                z = np.zeros((8, 8), dtype=np.int32)
                z[_ZIG_ROWS, _ZIG_COLS] = tbl
                qt[tq] = z
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for i in range(nc):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * i]))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG (progressive/extended/arithmetic) — "
                "library integration point")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                tds = seg[2 + 2 * i]
                scan_comps.append((cs, tds >> 4, tds & 0x0F))
            data_start = pos + seglen
            out_planes, pos = _decode_scan(
                payload, data_start, frame, scan_comps, qt,
                huff_dc, huff_ac, restart_interval, out_planes)
            continue
        pos += seglen

    if frame is None or out_planes is None:
        raise ValueError("JPEG stream held no decodable scan")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, hs, vs, _tq) in comps:
        plane = out_planes[cid]
        # upsample to full resolution (sample replication) then crop
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0] + 128.0), 0, 255).astype(np.uint8)
    y, cb, cr = (p + 128.0 for p in planes)
    cb, cr = cb - 128.0, cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _entropy_segment(payload: bytes, start: int):
    """Extract entropy-coded bytes from ``start`` to the next real marker,
    removing 0xFF00 stuffing and splitting at RSTn boundaries — all
    vectorized: one numpy scan finds every 0xFF, classification picks the
    terminator and the RSTn cut points, and de-stuffing is a C-level
    ``bytes.replace`` per slice (the old per-byte Python loop was ~35% of
    decode wall time).

    Returns (list of de-stuffed byte segments, position of the terminating
    marker's 0xFF)."""
    n = len(payload)
    arr = np.frombuffer(payload, dtype=np.uint8)
    ffpos = start + np.nonzero(arr[start:] == 0xFF)[0]
    if len(ffpos) and ffpos[-1] == n - 1:
        # trailing lone 0xFF acts as the EOI terminator (old behavior)
        term_tail = int(ffpos[-1])
        ffpos = ffpos[:-1]
    else:
        term_tail = n
    nxt = arr[ffpos + 1] if len(ffpos) else np.array([], dtype=np.uint8)
    real = (nxt != 0x00) & ~((nxt >= 0xD0) & (nxt <= 0xD7))
    ridx = np.nonzero(real)[0]
    end = int(ffpos[ridx[0]]) if len(ridx) else term_tail
    rst = ffpos[(~real) & (nxt != 0x00) & (ffpos < end)]
    segs = []
    prev = start
    for p in rst.tolist():
        segs.append(payload[prev:p].replace(b"\xff\x00", b"\xff"))
        prev = p + 2
    segs.append(payload[prev:end].replace(b"\xff\x00", b"\xff"))
    return segs, end


def _decode_scan(payload, data_start, frame, scan_comps, qt,
                 huff_dc, huff_ac, restart_interval, out_planes):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    byid = {c[0]: c for c in comps}
    segs, end_pos = _entropy_segment(payload, data_start)
    if out_planes is None:
        out_planes = {}

    if len(scan_comps) == 1:
        # non-interleaved scan: blocks cover ceil(comp_w/8) × ceil(comp_h/8)
        cs, td, ta = scan_comps[0]
        cid, hs, vs, tq = byid[cs]
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        bx, by = -(-cw // 8), -(-ch // 8)
        grids = {cid: (bx, by)}
        mcu_layout = [(cid, 1, 1, tq, td, ta)]
        mcus_x, mcus_y = bx, by
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        grids = {}
        mcu_layout = []
        for cs, td, ta in scan_comps:
            cid, hs, vs, tq = byid[cs]
            grids[cid] = (mcus_x * hs, mcus_y * vs)
            mcu_layout.append((cid, hs, vs, tq, td, ta))

    # zigzag-order coefficient rows per component; dequant + zigzag
    # scatter + IDCT all run vectorized over every block at the end
    coeff64 = {cid: np.zeros((gy * gx, 64), dtype=np.int32)
               for cid, (gx, gy) in grids.items()}
    pred = {cid: 0 for cid in grids}
    total_mcus = mcus_x * mcus_y
    luts: dict[tuple, list] = {}

    def lut_for(tbl: dict, kind: str):
        key = (id(tbl), kind)
        if key not in luts:
            if kind == "dc":
                luts[key] = _fast_dc_lut(tbl)
            elif kind == "ac":
                luts[key] = _fast_ac_lut(tbl)
            else:
                luts[key] = _huff_lut(tbl)
        return luts[key]

    # per-symbol hot path: a memoryview over the window array (C-speed int
    # indexing, no numpy scalar boxing) plus ONE packed-list lookup per
    # symbol ((sym << 5) | len); EXTEND is inlined — pure-int arithmetic
    # end to end, ~10 cheap ops per coefficient.
    # nonzero coefficients accumulate as flat (block*64+k, value) append
    # streams — one vectorized scatter per component at the end instead of
    # a 64-slot row assignment per block (most blocks are nearly empty)
    sparse = {cid: ([], []) for cid in grids}
    # resolve tables once per scan, not once per MCU
    layout = [(cid, hs, vs, grids[cid][0],
               lut_for(huff_dc[td], "dc"), lut_for(huff_ac[ta], "ac"),
               lut_for(huff_dc[td], "slow"), lut_for(huff_ac[ta], "slow"),
               sparse[cid][0].append, sparse[cid][1].append)
              for (cid, hs, vs, tq, td, ta) in mcu_layout]
    seg_idx = 0
    v16, seg_bits = _window16(segs[0])
    v16m = memoryview(v16)
    nwin = len(v16)
    pos = 0
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG scan missing expected restart marker")
            v16, seg_bits = _window16(segs[seg_idx])
            v16m = memoryview(v16)
            nwin = len(v16)
            pos = 0
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(m, mcus_x)
        for (cid, hs, vs, gx, dlut, alut, dslow, aslow, iap, vap) in layout:
            p0 = pred[cid]
            for v in range(vs):
                for hh in range(hs):
                    if pos >= nwin:
                        raise ValueError("truncated JPEG scan")
                    base = ((my * vs + v) * gx + mx * hs + hh) << 6
                    e = dlut[v16m[pos]]
                    if e:
                        pos += e >> 13
                        p0 += (e & 0x1FFF) - 4096
                    else:  # rare: long code+field, or invalid prefix
                        e = dslow[v16m[pos]]
                        ln = e & 31
                        if ln == 0:
                            raise ValueError(
                                "invalid JPEG Huffman code (corrupt or "
                                "truncated scan)")
                        pos += ln
                        s = e >> 5
                        if s:
                            mag = v16m[pos] >> (16 - s)
                            pos += s
                            p0 += (mag if mag >= (1 << (s - 1))
                                   else mag - (1 << s) + 1)
                    if p0:
                        iap(base)
                        vap(p0)
                    k = 1
                    while k < 64:
                        if pos >= nwin:
                            raise ValueError("truncated JPEG scan")
                        e = alut[v16m[pos]]
                        if e:
                            pos += e >> 16
                            val = (e & 0xFFF) - 2048
                            if val:
                                k += (e >> 12) & 15
                                if k > 63:
                                    raise ValueError(
                                        "JPEG AC index overrun")
                                iap(base + k)
                                vap(val)
                                k += 1
                            elif e & 0xF000:   # ZRL (run 15, value 0)
                                k += 16
                            else:              # EOB
                                break
                            continue
                        e = aslow[v16m[pos]]
                        ln = e & 31
                        if ln == 0:
                            raise ValueError(
                                "invalid JPEG Huffman code (corrupt or "
                                "truncated scan)")
                        pos += ln
                        rs = e >> 5
                        size = rs & 0x0F
                        if size == 0:
                            if rs >> 4 == 15:  # ZRL
                                k += 16
                                continue
                            break              # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC index overrun")
                        mag = v16m[pos] >> (16 - size)
                        pos += size
                        iap(base + k)
                        vap(mag if mag >= (1 << (size - 1))
                            else mag - (1 << size) + 1)
                        k += 1
            pred[cid] = p0

    tq_of = {c[0]: c[3] for c in comps}
    for cid, (gx, gy) in grids.items():
        idxs, vals = sparse[cid]
        rows = coeff64[cid]
        if idxs:
            rows.reshape(-1)[np.asarray(idxs, dtype=np.int64)] = \
                np.asarray(vals, dtype=np.int32)
        zz = np.zeros((gx * gy, 8, 8), dtype=np.float64)
        zz[:, _ZIG_ROWS, _ZIG_COLS] = rows
        zz *= qt[tq_of[cid]][None, :, :]
        # vectorized IDCT over all blocks: f = Tᵀ F T as two batched
        # BLAS matmuls (the einsum form of the same contraction was ~5×
        # slower)
        blocks = _T.T @ zz @ _T
        plane = (blocks.reshape(gy, gx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8))
        out_planes[cid] = plane  # one scan per component in baseline
    return out_planes, end_pos


# ================================================================== encoder
def _bitlen(v: int) -> int:
    return int(v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nacc = 0, 0

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nacc = 0, 0


# encoder Huffman tables (canonical, self-built — see module docstring):
# DC: categories 0..11 all at code length 4;  AC: all 162 run/size symbols
# at code length 8 (EOB=0x00, ZRL=0xF0 included), all-ones code unused.
_ENC_DC_SYMS = list(range(12))
_ENC_AC_SYMS = sorted(
    {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
_ENC_DC_CODE = {sym: (4, i) for i, sym in enumerate(_ENC_DC_SYMS)}
_ENC_AC_CODE = {sym: (8, i) for i, sym in enumerate(_ENC_AC_SYMS)}


def _dht_segment(tc: int, th: int, syms: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bytes([(tc << 4) | th] + bits + syms)


def _quant_table(quality_step: int) -> np.ndarray:
    """Simple frequency-weighted quant table: q[u,v] = 1 + (u+v)*step.

    step=0 → all-ones (near-lossless: error only from coefficient
    rounding); larger steps quantize high frequencies harder, the shape of
    the standard tables without copying their constants."""
    u = np.arange(8)
    return (1 + (u[:, None] + u[None, :]) * quality_step).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality_step: int = 0,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JPEG bytes.

    ``quality_step`` scales the frequency-weighted quant table (0 =
    near-lossless); ``subsample`` ∈ {"444", "422", "420"} for color input;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    so the decoder's restart path is testable against real streams.
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        samp = {"444": [(1, 1)] * 3,
                "422": [(2, 1), (1, 1), (1, 1)],
                "420": [(2, 2), (1, 1), (1, 1)]}[subsample]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    q = _quant_table(quality_step)

    # per-component: downsample (box mean), pad to the MCU grid, DCT+quantize
    comp_blocks = []
    for plane, (hs, vs) in zip(planes, samp):
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            padded = np.pad(plane, ((0, ph - plane.shape[0]),
                                    (0, pw - plane.shape[1])), mode="edge")
            plane = padded.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        gh, gw = mcus_y * vs * 8, mcus_x * hs * 8
        plane = np.pad(plane, ((0, gh - plane.shape[0]),
                               (0, gw - plane.shape[1])), mode="edge")
        blocks = (plane.reshape(gh // 8, 8, gw // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        f = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
        qz = np.rint(f / q).astype(np.int32)
        comp_blocks.append(qz.reshape(gh // 8, gw // 8, 8, 8))

    # ---- headers
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    zz = q[_ZIG_ROWS, _ZIG_COLS].astype(np.uint8).tobytes()
    seg(0xDB, bytes([0x00]) + zz)                       # DQT table 0
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for i in range(ncomp):
        hs, vs = samp[i]
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    seg(0xC0, bytes(sof))                               # SOF0
    seg(0xC4, _dht_segment(0, 0, _ENC_DC_SYMS, 4))      # DC table 0
    seg(0xC4, _dht_segment(1, 0, _ENC_AC_SYMS, 8))      # AC table 0
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    sos = bytearray([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])                     # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    # ---- entropy-coded scan
    writer = _BitWriter()
    pred = [0] * ncomp

    def emit_block(block: np.ndarray, ci: int):
        zser = block[_ZIG_ROWS, _ZIG_COLS]
        diff = int(zser[0]) - pred[ci]
        pred[ci] = int(zser[0])
        s = _bitlen(abs(diff))
        ln, code = _ENC_DC_CODE[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zser[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = _ENC_AC_CODE[0xF0]
                writer.write(code, ln)
                run -= 16
            s = _bitlen(abs(v))
            ln, code = _ENC_AC_CODE[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            ln, code = _ENC_AC_CODE[0x00]
            writer.write(code, ln)

    total_mcus = mcus_x * mcus_y
    rst = 0
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out.extend(writer.out)
            writer = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci in range(ncomp):
            hs, vs = samp[ci]
            for v in range(vs):
                for hh in range(hs):
                    emit_block(comp_blocks[ci][my * vs + v, mx * hs + hh], ci)
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
