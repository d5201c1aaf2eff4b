"""Baseline JPEG codec in pure numpy (ITU-T T.81, public spec).

Round 6: JPEG was the last major image format behind the documented
"needs PIL/ffmpeg" seam — but baseline sequential JPEG needs no
library at all: canonical Huffman, 8×8 DCT, and YCbCr are all plain
arithmetic. This module implements

- :func:`decode_jpeg`: baseline + extended-sequential (SOF0/SOF1)
  AND progressive (SOF2, round 7) Huffman JPEG → uint8 array,
  (h, w, 3) RGB or (h, w) grayscale. Handles multiple DQT/DHT
  segments, chroma subsampling (4:4:4, 4:2:2, 4:2:0 — any h/v
  factors ≤ 4), restart markers, 0xFF00 byte stuffing, and for
  progressive frames the full Annex-G scan algebra: interleaved /
  non-interleaved DC scans, single-component AC bands (spectral
  selection), successive approximation with EOB-run batching and the
  G.7.2.3 correction-bit refinement. Arithmetic-coded and
  lossless/hierarchical JPEGs raise ``ValueError`` (callers fall
  back to the documented deterministic fake, same seam as before).
- :func:`encode_jpeg`: baseline encoder (Annex K quantization +
  Huffman tables, quality scaling per the classic IJG rule, 4:4:4 or
  4:2:0, optional restart interval) — the round-trip partner that
  lets tests pin the decoder without any imaging library.

Scale note: this is the THUMBNAIL/validation path — per-image work is
a Python-level Huffman bit walk (the IDCT and color math are
vectorized). A production 100 TB image pipeline hands `real_decoder=`
to ``decode_features`` (a GPU/turbojpeg stack); what this module buys
is a real, dependency-free default so the Spark plumbing runs on real
pixels instead of fakes.

Correctness strategy (no reference codec in the container): the
encoder and decoder share only the spec CONSTANTS (zigzag, Annex K
tables), not code paths — the DCT matrix is built from the textbook
formula and asserted orthonormal in tests, the zigzag constant is
asserted to be the spec's diagonal walk, and round-trips are checked
at tolerances a correct lossy codec must meet (exact-ish on DC-only
images, bounded error on smooth content, across subsampling modes
and restart intervals). Round 7 adds EXTERNALLY-assembled known-good
streams (tests/test_codec_vectors.py): hand-built T.81 bitstreams —
flat gray, flat 4:2:0 color, and a single-AC-coefficient ramp whose
expected pixels come from the spec's direct IDCT formula — decoded
without ever touching this module's encoder, so a shared
encoder/decoder misassumption (transposed zigzag, sign convention)
can no longer round-trip its way past the suite.
"""

from __future__ import annotations

import numpy as np

# -- spec constants ------------------------------------------------------

# zigzag scan order (T.81 figure 5): ZIGZAG[i] = raster index of the
# i-th coefficient in transmission order
ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 luminance / K.2 chrominance quantization tables (raster order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def dct_matrix() -> np.ndarray:
    """The orthonormal 8×8 DCT-II matrix from the textbook formula:
    ``C[k, n] = a(k) * cos((2n+1) k pi / 16)`` with ``a(0)=sqrt(1/8)``,
    ``a(k>0)=sqrt(2/8)``. Forward DCT of block B is ``C @ B @ C.T``;
    inverse is ``C.T @ B @ C`` (orthonormality is asserted in tests,
    which pins both directions independently of each other)."""
    n = np.arange(8)
    k = n.reshape(8, 1)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_DCT = dct_matrix()


# -- bit I/O -------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers are consumed by the caller via
    :meth:`sync_restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # byte position
        self.bits = 0  # bit buffer (int)
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bits = (self.bits << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # marker: feed zero bits; caller handles via sync
                    self.bits = (self.bits << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 24:
            raise ValueError(f"bit read of {n} exceeds JPEG magnitude range")
        self._fill()
        v = (self.bits >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.bits &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bits = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _HuffTable:
    """Canonical Huffman decode per T.81 F.2.2.3: mincode/maxcode per
    length, O(16) per symbol."""

    def __init__(self, bits: list[int], huffval: list[int]):
        if len(huffval) < sum(bits):
            raise ValueError("DHT symbol table shorter than its counts")
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.huffval = list(huffval)
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1] == 0:
                self.maxcode[ln] = -1
            else:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read(1)
        ln = 1
        while code > self.maxcode[ln]:
            if ln >= 16:
                raise ValueError("bad Huffman code")
            code = (code << 1) | br.read(1)
            ln += 1
        return self.huffval[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map the t-bit magnitude value to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# -- decoder -------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_inner(payload)
    except IndexError as e:  # truncated segment -> poison-blob path
        raise ValueError(f"truncated JPEG: {e}") from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None
    coef = None  # progressive: per-component coefficient buffers
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[i : i + 2], "big")
        if seglen < 2:
            raise ValueError("corrupt JPEG segment length")
        body = payload[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                j += 1
                if prec:
                    tbl = np.frombuffer(body[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    tbl = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl  # DQT is stored in zigzag order
                qt[tid] = q
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nsym = sum(bits)
                vals = list(body[j + 17 : j + 17 + nsym])
                huff[(tc, th)] = _HuffTable(bits, vals)
                j += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (precision={prec})")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if h == 0 or w == 0 or ncomp == 0:
                raise ValueError("empty JPEG frame dimensions")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + c * 3 : 9 + c * 3]
                sh, sv = samp >> 4, samp & 0xF
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"bad JPEG sampling factors {sh}x{sv}")
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                # upsampling is integer-ratio repeat; a legal-but-odd
                # combo (e.g. luma 3x1 + chroma 2x1) must fail here
                # with a clear error, not later as a broadcast shape
                # mismatch deep in the scan loop
                if hmax % c["h"] or vmax % c["v"]:
                    raise ValueError(
                        "unsupported JPEG sampling ratio "
                        f"{c['h']}x{c['v']} vs max {hmax}x{vmax} "
                        "(non-integer upsampling factor)"
                    )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            order = []
            for c in range(ns):
                cid, tables = body[1 + c * 2 : 3 + c * 2]
                scan[cid] = (tables >> 4, tables & 0xF)
                order.append(cid)
            # MJPEG convention (Microsoft MJPG / OpenDML): AVI frame
            # streams may omit DHT entirely and assume the Annex K.3
            # typical tables in slots 0 (luma) / 1 (chroma). A stream
            # that carries ANY DHT is taken at its word — the fallback
            # fills only the standard slots, and only when absent.
            for (tc, th), std in (
                ((0, 0), HUFF_DC_LUMA), ((0, 1), HUFF_DC_CHROMA),
                ((1, 0), HUFF_AC_LUMA), ((1, 1), HUFF_AC_CHROMA),
            ):
                needed = any(
                    scan[cid][0 if tc == 0 else 1] == th for cid in order
                )
                if needed and (tc, th) not in huff:
                    huff[(tc, th)] = _HuffTable(*std)
            if not frame.get("progressive"):
                return _decode_scan(
                    payload, i, frame, scan, qt, huff, restart_interval
                )
            # progressive (SOF2, round 7): each SOS carries one
            # spectral-selection / successive-approximation pass over
            # the persistent coefficient buffers; decode it, advance
            # past its entropy data, keep walking markers
            if coef is None:
                coef = _alloc_coef(frame)
            ss, se = body[1 + ns * 2], body[2 + ns * 2]
            ahal = body[3 + ns * 2]
            ah, al = ahal >> 4, ahal & 0xF
            i = _progressive_scan(
                payload, i, frame, coef, order, scan, huff,
                restart_interval, ss, se, ah, al,
            )
        # else: APPn/COM — skip
    if frame is not None and frame.get("progressive") and coef is not None:
        return _reconstruct_progressive(frame, coef, qt)
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    idct = _DCT.T
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                if c["id"] not in scan:
                    raise ValueError("SOS missing a frame component")
                dc_t, ac_t = scan[c["id"]]
                dht_dc = huff.get((0, dc_t))
                dht_ac = huff.get((1, ac_t))
                q = qt.get(c["tq"])
                if dht_dc is None or dht_ac is None or q is None:
                    raise ValueError("missing Huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = dht_dc.decode(br)
                        diff = _extend(br.read(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = dht_ac.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        px = idct @ block.reshape(8, 8) @ _DCT
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    return _finish_planes(frame, planes)


def _finish_planes(frame, planes) -> np.ndarray:
    """Shared decode tail: crop each component plane to its sampled
    size, integer-repeat upsample to full resolution, level-shift,
    and color-convert (BT.601 YCbCr→RGB per JFIF)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for ci, c in enumerate(comps):
        sub_h = -(-h * c["v"] // vmax)
        sub_w = -(-w * c["h"] // hmax)
        p = planes[ci][:sub_h, :sub_w]
        if c["h"] != hmax or c["v"] != vmax:
            p = p.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        out.append(p[:h, :w] + 128.0)
    if len(out) == 1:
        return np.clip(out[0].round(), 0, 255).astype(np.uint8)
    if len(out) != 3:
        raise ValueError(f"unsupported component count {len(out)}")
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]).round(), 0, 255).astype(np.uint8)


# -- progressive decode (SOF2, round 7) ----------------------------------
#
# T.81 Annex G: a progressive frame transmits the quantized DCT
# coefficients over several scans — spectral selection (coefficient
# bands Ss..Se) × successive approximation (high bits first, then one
# refinement bit per scan). Each SOS updates persistent per-component
# coefficient buffers; the image is reconstructed once, after the
# last scan. The refinement logic below follows the spec's G.7.2.3
# correction-bit procedure.


def _alloc_coef(frame):
    """Per-component (blocks_y, blocks_x, 64) int32 buffers, sized to
    the MCU-padded interleaved grid (DC scans may be interleaved);
    coefficients are stored in ZIGZAG (transmission) order."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _nonint_blocks(frame, c):
    """Non-interleaved block-grid dims for one component: based on the
    component's OWN sampled size (ceil(px/8)), not the MCU-padded grid
    (T.81 A.2.2)."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    comp_w = -(-frame["w"] * c["h"] // hmax)  # ceil(w * h_i / hmax)
    comp_h = -(-frame["h"] * c["v"] // vmax)
    return -(-comp_h // 8), -(-comp_w // 8)


def _progressive_scan(
    payload, pos, frame, coef, order, scan, huff, restart_interval,
    ss, se, ah, al,
):
    """Decode one progressive SOS's entropy data into ``coef``;
    return the byte offset of the next marker."""
    comps = frame["comps"]
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if ss > 63 or se > 63 or se < ss:
        raise ValueError("bad progressive spectral selection")
    idx = []
    for cid in order:
        matches = [ci for ci, c in enumerate(comps) if c["id"] == cid]
        if not matches:
            raise ValueError("SOS references unknown component")
        idx.append(matches[0])
    if ss > 0 and len(idx) != 1:
        raise ValueError("progressive AC scan must be single-component")
    br = _BitReader(payload, pos)

    if ss == 0:
        _prog_dc_scan(frame, coef, idx, scan, huff, br, restart_interval, ah, al)
    else:
        _prog_ac_scan(
            frame, coef, idx[0], scan, huff, br, restart_interval, ss, se, ah, al
        )

    # locate the next marker (skip stuffed 0xFF00 and RSTn)
    p = br.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if 0xD0 <= payload[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return n


def _prog_dc_scan(frame, coef, idx, scan, huff, br, restart_interval, ah, al):
    comps = frame["comps"]
    pred = {ci: 0 for ci in idx}
    if len(idx) == 1:
        # non-interleaved: raster over the component's own block grid
        ci = idx[0]
        c = comps[ci]
        bh, bw = _nonint_blocks(frame, c)
        units = [(ci, by, bx) for by in range(bh) for bx in range(bw)]
        per_unit = 1
    else:
        units = []
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                mcu = []
                for ci in idx:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            mcu.append(
                                (ci, my * c["v"] + by, mx * c["h"] + bx)
                            )
                units.append(mcu)
        per_unit = None  # units are whole MCUs
    n_unit = 0

    def handle(ci, by, bx):
        if ah == 0:
            dht = huff.get((0, scan[comps[ci]["id"]][0]))
            if dht is None:
                raise ValueError("missing DC Huffman table")
            t = dht.decode(br)
            pred[ci] += _extend(br.read(t), t)
            coef[ci][by, bx, 0] = pred[ci] << al
        else:  # refinement: one bit per block
            if br.read(1):
                coef[ci][by, bx, 0] |= 1 << al

    if per_unit == 1:
        for ci, by, bx in units:
            if restart_interval and n_unit and n_unit % restart_interval == 0:
                br.sync_restart()
                pred = {k: 0 for k in pred}
            n_unit += 1
            handle(ci, by, bx)
    else:
        for mcu in units:
            if restart_interval and n_unit and n_unit % restart_interval == 0:
                br.sync_restart()
                pred = {k: 0 for k in pred}
            n_unit += 1
            for ci, by, bx in mcu:
                handle(ci, by, bx)


def _prog_ac_scan(
    frame, coef, ci, scan, huff, br, restart_interval, ss, se, ah, al
):
    comps = frame["comps"]
    dht = huff.get((1, scan[comps[ci]["id"]][1]))
    if dht is None:
        raise ValueError("missing AC Huffman table")
    bh, bw = _nonint_blocks(frame, comps[ci])
    buf = coef[ci]
    eobrun = 0
    n_blk = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and n_blk and n_blk % restart_interval == 0:
                br.sync_restart()
                eobrun = 0
            n_blk += 1
            zz = buf[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(zz, dht, br, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(zz, dht, br, ss, se, al, eobrun)


def _ac_first_block(zz, dht, br, ss, se, al, eobrun):
    """T.81 G.2.2 first-pass AC band decode for one block; returns the
    remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = dht.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: this block is one of 2^r
            if r:
                eobrun += br.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("progressive AC run overflow")
        zz[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _ac_refine_block(zz, dht, br, ss, se, al, eobrun):
    """T.81 G.7.2.3 refinement: one correction bit per already-nonzero
    coefficient, newly-significant coefficients appear at ±(1<<al)."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if br.read(1) and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = dht.decode(br)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r  # includes this block; -1 below
                    if r:
                        eobrun += br.read(r)
                    break
                # ZRL: advance past 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1 bit")
                newval = p1 if br.read(1) else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            zz[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        return eobrun - 1
    return 0


def _reconstruct_progressive(frame, coef, qt):
    """Dequantize + IDCT every component's coefficient buffer at once
    (vectorized over blocks), then the shared upsample/color tail."""
    comps = frame["comps"]
    planes = []
    idct = _DCT.T
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        zz = coef[ci].astype(np.float64) * q  # (by, bx, 64) zigzag order
        blocks = np.zeros_like(zz)
        blocks[:, :, ZIGZAG] = zz
        by, bx = blocks.shape[:2]
        b8 = blocks.reshape(by, bx, 8, 8)
        px = np.einsum("ab,yxbc,cd->yxad", idct, b8, _DCT, optimize=True)
        planes.append(
            px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    return _finish_planes(frame, planes)


# -- encoder (round-trip partner for tests / real re-encode) -------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def pad(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits per spec


def _huff_encode_table(bits, huffval):
    """symbol -> (code, length) from the canonical (bits, huffval)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """Classic IJG quality scaling of an Annex K table."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * s + 50) // 100
    return np.clip(t, 1, 255)


def _magnitude(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample=False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder: Annex K tables scaled by ``quality``,
    4:4:4 by default, 4:2:0 with ``subsample=True`` (or ``"420"``),
    4:2:2 with ``subsample="422"``; optional DRI restarts. Accepts
    (h, w) grayscale or (h, w, 3) RGB uint8."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        ycc = [img]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ycc = [y, cb, cr]

    q_luma = _quality_scale(QUANT_LUMA, quality)
    q_chroma = _quality_scale(QUANT_CHROMA, quality)
    mode = "420" if subsample is True else (subsample or "444")
    if gray:
        mode = "444"
    # luma sampling factors per chroma mode (chroma is always 1x1)
    sx, sy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[mode]
    hmax, vmax = sx, sy

    comps = []
    for ci, plane in enumerate(ycc):
        if ci > 0 and mode != "444":
            # sx x sy mean subsample (pad to a multiple first)
            ph = plane
            if ph.shape[0] % sy:
                ph = np.vstack([ph] + [ph[-1:]] * (sy - ph.shape[0] % sy))
            if ph.shape[1] % sx:
                ph = np.hstack([ph] + [ph[:, -1:]] * (sx - ph.shape[1] % sx))
            plane = ph.reshape(
                ph.shape[0] // sy, sy, ph.shape[1] // sx, sx
            ).mean(axis=(1, 3))
            cw, cv = 1, 1
        else:
            cw, cv = (hmax, vmax) if ci == 0 else (1, 1)
        comps.append({"plane": plane, "h": cw, "v": cv,
                      "tq": 0 if ci == 0 else 1})

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad planes to full MCU coverage (edge replicate)
    for c in comps:
        th = mcuy * c["v"] * 8
        tw = mcux * c["h"] * 8
        p = c["plane"]
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        c["plane"] = p - 128.0

    dc_tabs = [_huff_encode_table(*HUFF_DC_LUMA), _huff_encode_table(*HUFF_DC_CHROMA)]
    ac_tabs = [_huff_encode_table(*HUFF_AC_LUMA), _huff_encode_table(*HUFF_AC_CHROMA)]
    qts = [q_luma, q_chroma]

    bw = _BitWriter()
    pred = [0] * len(comps)
    body_parts = []
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.pad()
                body_parts.append(bytes(bw.out))
                body_parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                bw = _BitWriter()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                ti = 0 if ci == 0 else 1
                q = qts[ti]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        block = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _DCT @ block @ _DCT.T
                        zz = np.round(
                            coef.reshape(64)[ZIGZAG] / q[ZIGZAG]
                        ).astype(np.int64)
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t = _magnitude(diff)
                        code, ln = dc_tabs[ti][t]
                        bw.write(code, ln)
                        if t:
                            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_tabs[ti][0xF0]
                                bw.write(code, ln)
                                run -= 16
                            s = _magnitude(v)
                            code, ln = ac_tabs[ti][(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = ac_tabs[ti][0x00]  # EOB
                            bw.write(code, ln)
    bw.pad()
    body_parts.append(bytes(bw.out))
    entropy = b"".join(body_parts)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qts[: 1 if gray else 2]):
        out += seg(0xDB, bytes([tid]) + bytes(q[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        c = comps[ci]
        sof += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, sof)
    hts = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if not gray:
        hts += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for tc, th, (bits, vals) in hts:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
