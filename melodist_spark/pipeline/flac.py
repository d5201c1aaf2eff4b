"""FLAC decoder (+ test encoder) in pure numpy — xiph.org public spec.

Audio corpora ship as FLAC (LibriSpeech, MLS, many speech sets), and
FLAC needs no codec library: Rice coding, fixed/LPC predictors, and
inter-channel decorrelation are plain integer arithmetic. Round 6 —
this moves compressed AUDIO from the "needs ffmpeg" seam to a real
pure-python path, like PNG/JPEG/GIF did for images.

- :func:`decode_flac`: STREAMINFO + frame stream → (samples int32
  array of shape (n, channels), sample_rate, bits_per_sample). Supports 8/16/24-bit,
  1-8 channels, all four channel assignments (independent,
  left/side, right/side, mid/side), CONSTANT / VERBATIM / FIXED
  (orders 0-4) / LPC (orders 1-32) subframes, wasted bits, 4- and
  5-bit Rice residual methods with partitioning and the raw-bits
  escape, UTF-8 frame numbers, and CRC-8/CRC-16 verification
  (corrupt streams raise ValueError — the poison-blob contract).
- :func:`encode_flac`: a real compressing encoder for the round-trip
  tests: fixed predictors (best of orders 0-2 per block), Rice
  residuals, optional mid-side stereo, wasted-bit detection. Shares
  only spec CONSTANTS with the decoder.

Scale note: the bit walk is Python-level — the thumbnail/validation
path, exactly like pipeline/jpeg.py; production audio pipelines hand
``real_decoder=`` to ``decode_features``.
"""

from __future__ import annotations

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (frame CRCs
    cover whole bytes, so the reader must be able to report how many
    bytes a frame consumed)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    @property
    def bytepos(self) -> int:
        return (self.bitpos + 7) // 8

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        bp = self.bitpos
        data = self.data
        while n > 0:
            byte = data[bp >> 3]
            avail = 8 - (bp & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            bp += take
            n -= take
        self.bitpos = bp
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC unary run too long")

    def align(self):
        self.bitpos = (self.bitpos + 7) & ~7


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad FLAC UTF-8 number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_residual(br: _Bits, n: int, pred_order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 + method  # rice parameter width
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("FLAC partition size mismatch")
    out = np.empty(n - pred_order, dtype=np.int64)
    k = 0
    for p in range(nparts):
        cnt = n // nparts - (pred_order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC partition shorter than predictor order")
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            for i in range(cnt):
                out[k] = br.read_signed(bits) if bits else 0
                k += 1
        else:
            for i in range(cnt):
                q = br.read_unary()
                r = br.read(param) if param else 0
                u = (q << param) | r
                out[k] = (u >> 1) ^ -(u & 1)  # zigzag
                k += 1
    return out


def _decode_subframe(br: _Bits, n: int, bps: int) -> np.ndarray:
    # valid FLAC never overflows int64 in the predictor recurrences;
    # corrupt streams can, and garbage-in/garbage-out is fine as long
    # as it is silent and non-fatal (CRC checks reject the frame)
    with np.errstate(over="ignore"):
        return _decode_subframe_inner(br, n, bps)


def _decode_subframe_inner(br: _Bits, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe sync bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count - 1
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = np.full(n, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.read_signed(eff) for _ in range(n)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        coefs = FIXED_COEFFS[order]
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = resid[i - order] + pred
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = 0
            for j in range(order):
                pred += coefs[j] * out[i - 1 - j]
            out[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    info = None
    while True:
        if i + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[i]
        last = hdr & 0x80
        btype = hdr & 0x7F
        size = int.from_bytes(payload[i + 1 : i + 4], "big")
        body = payload[i + 4 : i + 4 + size]
        if btype == 0:  # STREAMINFO
            br = _Bits(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, channels, bps, total)
        i += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = info

    chunks = []
    n_done = 0
    while i < len(payload) and (total == 0 or n_done < total):
        frame_start = i
        br = _Bits(payload, i)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = _SAMPLE_SIZES.get(ss_code, bps) if ss_code else bps
        crc8_end = br.bytepos
        if _crc8(payload[frame_start:crc8_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_decode_subframe(br, n, fbps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            # stereo decorrelation; the SIDE subframe carries +1 bit.
            # 8 = left/side (side second), 9 = right/side (side FIRST),
            # 10 = mid/side (side second)
            extra = (0, 1) if ch_code in (8, 10) else (1, 0)
            a = _decode_subframe(br, n, fbps + extra[0])
            b = _decode_subframe(br, n, fbps + extra[1])
            if ch_code == 8:  # a = left, b = side; right = left - side
                subs = [a, a - b]
            elif ch_code == 9:  # a = side, b = right; left = right + side
                subs = [b + a, b]
            else:  # a = mid, b = side
                m2 = (a << 1) | (b & 1)
                subs = [(m2 + b) >> 1, (m2 - b) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        br.align()
        crc16_end = br.bytepos
        if _crc16(payload[frame_start:crc16_end]) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        i = br.bytepos
        if len(subs) != channels:
            raise ValueError("FLAC frame channel count mismatch")
        chunks.append(np.stack(subs, axis=1))
        n_done += n
    if not chunks:
        raise ValueError("FLAC has no frames")
    samples = np.concatenate(chunks, axis=0)
    if total:
        samples = samples[:total]
    return samples.astype(np.int32), rate, bps


# -- encoder (round-trip partner) ----------------------------------------


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int):
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _write_utf8_number(bw: _BitW, v: int):
    """Standard UTF-8 envelope: an n-byte form carries (7 - n) lead
    bits + 6 per continuation, so capacities are 11/16/21/26/31 bits
    for 2-6 bytes."""
    if v < 0x80:
        bw.write(v, 8)
        return
    for nbytes, capbits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31)):
        if v < (1 << capbits):
            break
    else:
        raise ValueError("frame number too large for FLAC UTF-8 coding")
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    bw.write(lead_mask | (v >> shift), 8)
    for k in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)


def _rice_param(resid: np.ndarray) -> int:
    if not len(resid):
        return 0
    mean = float(np.abs(resid).mean())
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _encode_subframe(bw: _BitW, x: np.ndarray, bps: int):
    """FIXED predictor subframe (best of orders 0-2), with wasted-bit
    detection; falls back to VERBATIM when prediction loses."""
    wasted = 0
    if np.any(x):
        wasted = int(min(
            np.min([(int(v) & -int(v)).bit_length() - 1 for v in x if v])
            if np.any(x) else 0, bps - 1,
        ))
    if wasted > 0:
        x = x >> wasted
    eff = bps - wasted
    if np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)
        bw.write(int(x[0]), eff)
        return
    best = None
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        resid = x.astype(np.int64)
        for _ in range(order):
            resid = np.diff(resid)
        cost = len(resid) * (_rice_param(resid[order:] if order else resid) + 2)
        if best is None or cost < best[1]:
            best = (order, cost)
    order = best[0]
    resid = x.astype(np.int64)
    for _ in range(order):
        resid = np.diff(resid)
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    for v in x[:order]:
        bw.write(int(v), eff)
    # residual: method 0 (4-bit rice), partition order 0
    bw.write(0, 2)
    bw.write(0, 4)
    param = min(_rice_param(resid), 14)
    bw.write(param, 4)
    for v in resid:
        u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def encode_flac(
    samples: np.ndarray, rate: int = 16000, bps: int = 16,
    block: int = 4096, mid_side: bool = False,
) -> bytes:
    """Compressing FLAC encoder (FIXED predictors + Rice, optional
    mid-side stereo) — exact/lossless by construction."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    total, channels = x.shape
    lim = 1 << (bps - 1)
    if x.min() < -lim or x.max() >= lim:
        raise ValueError(f"samples exceed {bps}-bit range")

    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.buf += bytes(16)  # md5 unset
    out += bytes([0x80]) + len(si.buf).to_bytes(3, "big") + si.buf

    for fi, start in enumerate(range(0, total, block)):
        blk = x[start : start + block]
        n = len(blk)
        bw = _BitW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # 16-bit blocksize follows
        bw.write(0, 4)  # rate from STREAMINFO
        use_ms = mid_side and channels == 2
        bw.write(10 if use_ms else channels - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, fi)
        bw.write(n - 1, 16)
        hdr = bytes(bw.buf)  # bit-aligned here (14+1+1+4+4+4+3+1 = 32)
        bw.write(_crc8(hdr), 8)
        if use_ms:
            left, right = blk[:, 0], blk[:, 1]
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(bw, mid, bps)
            _encode_subframe(bw, side, bps + 1)
        else:
            for c in range(blk.shape[1]):
                _encode_subframe(bw, blk[:, c], bps)
        bw.align()
        frame = bytes(bw.buf)
        bw.write(_crc16(frame), 16)
        out += bw.buf
    return bytes(out)
