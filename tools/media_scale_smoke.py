"""Scale smoke for the perceptual-hash media path: distributed
synthetic PNG corpus (with planted re-encodes and one-bit edits) →
`image_dhash` → banded near-dup pairs, plus a WAV corpus →
`audio_fingerprint`. Prices the real pure-numpy codec + hash kernels
per item — the per-task rate a cluster multiplies by its executor
count (every stage here is an Arrow-batched map; the only shuffle is
the candidate band join).

Usage: python tools/media_scale_smoke.py [n_images] [n_audio]
       (defaults 100000 10000; images 32x32 RGB, audio 1 s @ 8 kHz)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from melodist_spark.session import get_spark

PAYLOAD_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("payload", BinaryType())]
)


def _gen_images(batches):
    from melodist_spark.pipeline.multimodal import encode_png, encode_ppm

    for pdf in batches:
        rows = []
        for i in pdf["id"]:
            i = int(i)
            group = i - (i % 10)
            base = np.random.default_rng(group).integers(
                0, 256, size=(32, 32, 3), dtype=np.uint8
            )
            if i % 10 == 0:  # the group's base image
                rows.append((i, encode_png(base)))
            elif i % 10 == 1:  # exact pixels, different container
                rows.append((i, encode_ppm(base)))
            elif i % 10 == 2:  # one-sampled-pixel edit (hamming 1)
                e = base.copy()
                e[2, 2] = 255 if e[2, 6].mean() > e[2, 2].mean() else 0
                rows.append((i, encode_png(e)))
            else:  # unique image
                img = np.random.default_rng(1_000_000 + i).integers(
                    0, 256, size=(32, 32, 3), dtype=np.uint8
                )
                rows.append((i, encode_png(img)))
        yield pd.DataFrame(rows, columns=["media_id", "payload"])


def _gen_audio(batches):
    for pdf in batches:
        rows = []
        t = np.arange(8000) / 8000.0
        for i in pdf["id"]:
            i = int(i)
            group = i - (i % 10)
            # members 0/1 of each group share a signal (1 planted
            # -6 dB copy per group); the rest are unique clips
            rng = np.random.default_rng(group if i % 10 < 2 else 10**6 + i)
            f0 = 200 + rng.uniform(0, 1000)
            sig = 0.4 * np.sin(2 * np.pi * f0 * t) * (
                0.2 + np.abs(np.sin(2 * np.pi * rng.uniform(0.5, 3) * t))
            )
            gain = 0.5 if i % 10 == 1 else 1.0  # planted -6 dB copy
            pcm = (np.clip(gain * sig, -1, 1) * 32767).astype("<i2").tobytes()
            fmt = (
                (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
                + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            )
            chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
            wav = (
                b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
                + b"WAVE" + chunks
            )
            rows.append((i, wav))
        yield pd.DataFrame(rows, columns=["media_id", "payload"])


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_audio = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    spark = get_spark("media_scale_smoke", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.multimodal import (
        audio_fingerprint,
        dhash_neardup_pairs,
        image_dhash,
        image_phash,
    )

    t0 = time.perf_counter()
    imgs = (
        spark.range(n_images, numPartitions=64)
        .mapInPandas(_gen_images, PAYLOAD_SCHEMA)
        .persist()
    )
    imgs.count()
    t1 = time.perf_counter()
    print(
        f"generate+encode {n_images} PNGs: {t1 - t0:.1f}s "
        f"({n_images / (t1 - t0):,.0f} imgs/s)", flush=True,
    )

    hashes = image_dhash(imgs).persist()
    hashes.count()
    t2 = time.perf_counter()
    print(
        f"image_dhash (decode+hash): {t2 - t1:.1f}s "
        f"({n_images / (t2 - t1):,.0f} imgs/s)", flush=True,
    )

    phashes = image_phash(imgs).persist()
    phashes.count()
    t1b = time.perf_counter()
    print(
        f"image_phash (decode+DCT hash): {t1b - t2:.1f}s "
        f"({n_images / (t1b - t2):,.0f} imgs/s)", flush=True,
    )
    phashes.unpersist()
    t2 = t1b

    pairs = dhash_neardup_pairs(hashes, max_distance=3, num_bands=4)
    n_pairs = pairs.count()
    t3 = time.perf_counter()
    # every group of 10 plants a 3-member cluster => >= 3 pairs/group
    floor = 3 * (n_images // 10)
    print(
        f"banded near-dup pairs: {t3 - t2:.1f}s ({n_pairs} pairs, "
        f"planted floor {floor})", flush=True,
    )
    assert n_pairs >= floor, (n_pairs, floor)

    aud = (
        spark.range(n_audio, numPartitions=64)
        .mapInPandas(_gen_audio, PAYLOAD_SCHEMA)
        .persist()
    )
    aud.count()
    t4 = time.perf_counter()
    print(f"generate {n_audio} WAVs: {t4 - t3:.1f}s", flush=True)

    fps = audio_fingerprint(aud).persist()
    # rows sitting in a shared-fingerprint group: every planted -6 dB
    # pair contributes 2 (envelope collisions between unrelated clips
    # can only merge groups, never split the planted ones)
    n_shared = (
        fps.groupBy("afp")
        .count()
        .filter(F.col("count") >= 2)
        .agg(F.sum("count"))
        .first()[0]
        or 0
    )
    t5 = time.perf_counter()
    print(
        f"audio_fingerprint: {t5 - t4:.1f}s "
        f"({n_audio / (t5 - t4):,.0f} clips/s; {n_shared} rows in "
        f"gain-invariant groups, planted floor {2 * (n_audio // 10)})",
        flush=True,
    )
    assert n_shared >= 2 * (n_audio // 10), n_shared
    print(f"TOTAL {t5 - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
