"""AVI (RIFF) container parsing and MJPEG video decode, pure numpy.

Motion-JPEG inside an AVI container is the one *real* video format a
numpy-only environment can fully decode: the container is a plain
RIFF chunk tree (Microsoft AVI, documented in the public OpenDML /
AVI RIFF specs) and every frame is an independent baseline JPEG that
:mod:`melodist_spark.pipeline.jpeg` already handles — including the
MJPEG convention of omitting DHT segments (the decoder falls back to
the Annex K.3 typical tables). This closes part of the video seam the
reference-parity work left behind ``resize_stub``: H.264/MP4 still
needs the absent ffmpeg, but MJPEG/AVI — the standard capture and
intermediate format — decodes for real, frame-accurate, and feeds the
same image operators (``resize_images``, ``decode_features``) as any
still image.

Scale notes: `parse_avi` walks the chunk tree with O(#chunks) header
reads and returns byte *offsets* into the payload — sampling every
N-th frame touches only the sampled JPEG bytes, never re-encodes, and
`frame_dimensions` reads h/w from the SOF header without entropy
decode, so the ``sample_frames`` fan-out stays cheap even at 1%
sampling rates over hour-long captures.

Layout (RIFF spec): ``RIFF('AVI ' LIST('hdrl' 'avih'(MainAVIHeader)
LIST('strl' 'strh' 'strf' ...) ...) LIST('movi' '##dc'/'##db' ...)
['idx1'])``; chunks are word-aligned (odd sizes get a pad byte).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "parse_avi",
    "decode_avi_frames",
    "frame_dimensions",
    "encode_avi_mjpeg",
]


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for sibling chunks in
    buf[pos:end], honoring word alignment."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"AVI chunk {fourcc!r} overruns its parent "
                f"({body + size} > {end})"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)


def parse_avi(payload: bytes) -> dict:
    """Parse an AVI payload into frame offsets + stream metadata.

    Returns ``{"width", "height", "usec_per_frame", "n_frames",
    "handler", "frames": [(offset, size), ...]}`` where each frames
    entry is the byte range of one video chunk's body (``##dc`` /
    ``##db`` of the first 'vids' stream) inside ``payload`` — no
    frame bytes are copied here.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF form is not 'AVI '")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))

    meta = {
        "width": None, "height": None, "usec_per_frame": None,
        "n_frames": None, "handler": None, "frames": [],
    }
    vids_stream_no = None
    stream_no = 0

    for fourcc, body, size in _chunks(payload, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = payload[body : body + 4]
        if list_type == b"hdrl":
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2 == b"avih" and s2 >= 40:
                    (us, _maxbps, _pad, _flags, nf, _init, _streams,
                     _bufsz, w, h) = struct.unpack_from("<10I", payload, b2)
                    meta["usec_per_frame"] = us
                    meta["n_frames"] = nf
                    meta["width"] = w
                    meta["height"] = h
                elif f2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for f3, b3, s3 in _chunks(payload, b2 + 4, b2 + s2):
                        if f3 == b"strh" and s3 >= 8:
                            fcc_type = payload[b3 : b3 + 4]
                            if (fcc_type == b"vids"
                                    and vids_stream_no is None):
                                vids_stream_no = stream_no
                                meta["handler"] = (
                                    payload[b3 + 4 : b3 + 8]
                                    .decode("ascii", "replace").strip()
                                )
                    stream_no += 1
        elif list_type == b"movi":
            if vids_stream_no is None:
                raise ValueError("AVI has no 'vids' stream header")
            tag = b"%02d" % vids_stream_no
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2 == b"LIST" and payload[b2 : b2 + 4] == b"rec ":
                    for f3, b3, s3 in _chunks(payload, b2 + 4, b2 + s2):
                        if f3[:2] == tag and f3[2:4] in (b"dc", b"db"):
                            meta["frames"].append((b3, s3))
                elif f2[:2] == tag and f2[2:4] in (b"dc", b"db"):
                    meta["frames"].append((b2, s2))

    if vids_stream_no is None:
        raise ValueError("AVI has no 'vids' stream header")
    return meta


def frame_dimensions(jpeg_bytes: bytes) -> tuple[int, int]:
    """(height, width) from the SOF header — marker walk only, no
    entropy decode. Raises ValueError on a stream with no SOF."""
    if jpeg_bytes[:2] != b"\xff\xd8":
        raise ValueError("frame is not a JPEG stream")
    i, n = 2, len(jpeg_bytes)
    while i + 4 <= n:
        if jpeg_bytes[i] != 0xFF:
            raise ValueError("bad marker alignment in frame")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker byte — skip them (matches _decode_jpeg_inner)
        while i + 1 < n and jpeg_bytes[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        marker = jpeg_bytes[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", jpeg_bytes, i)
        if marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack_from(">HH", jpeg_bytes, i + 3)
            return h, w
        if marker == 0xDA:
            break
        i += seglen
    raise ValueError("no SOF header in frame")


def decode_avi_frames(
    payload: bytes, every_n: int = 1, max_frames: int | None = None
):
    """Decode every ``every_n``-th MJPEG frame of an AVI payload.

    Returns ``[(frame_idx, delay_cs, (h, w, 3) uint8 RGB), ...]``
    with ``delay_cs`` the container's per-frame duration in
    centiseconds (same row shape as ``decode_gif_frames``, so the
    two real video paths are interchangeable downstream). Only the
    sampled frames are entropy-decoded.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    meta = parse_avi(payload)
    us = meta["usec_per_frame"] or 0
    delay_cs = int(round(us / 10_000))
    out = []
    for idx in range(0, len(meta["frames"]), every_n):
        off, size = meta["frames"][idx]
        rgb = decode_jpeg(payload[off : off + size])
        if rgb.ndim == 2:
            rgb = np.repeat(rgb[:, :, None], 3, axis=2)
        out.append((idx, delay_cs, rgb))
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames, fps: float = 10.0, quality: int = 85
) -> bytes:
    """Write RGB frames as an MJPEG AVI (the round-trip partner for
    :func:`decode_avi_frames`). All frames must share one (h, w);
    each becomes an independent baseline-JPEG ``00dc`` chunk, and a
    standard ``idx1`` index is appended so strict players can seek.
    """
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("no frames to encode")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all AVI frames must share one (h, w)")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    usec = int(round(1_000_000 / fps))
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<10I4I",
        usec, max_size * int(round(fps)), 0, 0x10,  # AVIF_HASINDEX
        len(jpegs), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    # dwScale/dwRate as 1/fps-ish rational: scale=usec, rate=1e6
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, usec, 1_000_000, 0,
        len(jpegs), max_size, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", max_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx_entries = []
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_body), len(j)))
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_body)

    idx1 = b"".join(
        struct.pack("<4sIII", b"00dc", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return _chunk(b"RIFF", riff_body)
