"""Scale smoke for the MJPEG/AVI video path: distributed synthetic
AVI corpus → `sample_frames` (offset-walk + verbatim JPEG chunk
emission) → full decode of the sampled frames. Prices the claim in
pipeline/avi.py that sampling touches only the sampled bytes: the
sample stage should run at container-walk speed, with entropy decode
deferred to (and paid only by) the consumer stage.

Usage: python tools/video_scale_smoke.py [n_clips] [frames_per_clip]
       [every_n]  (defaults 2000 30 10; frames 48x64 RGB)
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
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from melodist_spark.session import get_spark

MEDIA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    fpc = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    every_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(
        "video_scale_smoke",
        shuffle_partitions=32,
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from melodist_spark.pipeline.multimodal import sample_frames

    def gen(batches):
        from melodist_spark.pipeline.avi import encode_avi_mjpeg

        yy, xx = np.mgrid[0:48, 0:64]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i == 0:
                    rows.append((i, "video", b"RIFF\x20\x00\x00\x00AVI LIST"))
                    continue  # one poison clip
                # every 10th clip is a q70 RE-ENCODE of its
                # predecessor's content — the planted video near-dup
                base = i - 1 if i % 10 == 9 else i
                q = 70 if i % 10 == 9 else 85
                # natural-image-like spectra (multi-frequency +
                # moving blob): a pure 2-tone sinusoid leaves ~60 of
                # pHash's 64 low-freq coefficients AT the median,
                # where they flip randomly under requantization
                # per-clip rng-drawn spatial parameters: a shared
                # parametric family would let clip i at frame t alias
                # clip j at frame u (phase base + t/3 is one axis),
                # which reads as near-dup because it IS near-dup —
                # distinct clips must be genuinely unrelated
                crng = np.random.default_rng(base)
                fx, fy = crng.uniform(5, 14, 2)
                p1, p2, p3 = crng.uniform(0, 6.28, 3)
                bx, by = crng.integers(5, 55), crng.integers(5, 40)

                def _frame(t):
                    g = (
                        90
                        + 55 * np.sin(xx / fx + t / 3.0 + p1)
                        + 35 * np.cos(yy / fy - t / 4.0 + p2)
                        + 60
                        * (
                            ((xx - (bx + 3 * t) % 64) ** 2
                             + (yy - by) ** 2)
                            < 140
                        )
                        + 25 * np.sin(xx * yy / 180.0 + p3)
                    ).clip(0, 255).astype(np.uint8)
                    return np.repeat(g[:, :, None], 3, axis=2)

                frames = [_frame(t) for t in range(fpc)]
                rows.append(
                    (i, "video", encode_avi_mjpeg(frames, fps=25, quality=q))
                )
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "payload"])

    t0 = time.perf_counter()
    clips = (
        spark.range(n_clips)
        .repartition(32)
        .mapInPandas(gen, schema=MEDIA)
        .persist()
    )
    n = clips.count()
    total_mb = clips.select(
        F.sum(F.length("payload")).alias("b")
    ).first()["b"] / 1e6
    t1 = time.perf_counter()
    print(
        f"generate {n} clips x {fpc} frames ({total_mb:.0f} MB): "
        f"{t1 - t0:.1f}s ({n * fpc / (t1 - t0):,.0f} frames encoded/s)",
        flush=True,
    )

    sampled = sample_frames(clips, every_n=every_n).persist()
    n_frames = sampled.count()
    n_err = sampled.filter(F.col("err").isNotNull()).count()
    t2 = time.perf_counter()
    print(
        f"sample_frames every_n={every_n}: {t2 - t1:.1f}s "
        f"({n_frames:,} frames out, {n_err} error rows; "
        f"{n / (t2 - t1):,.0f} clips/s container-walk)",
        flush=True,
    )

    # consumer stage: entropy-decode every sampled frame
    def decode(batches):
        from melodist_spark.pipeline.jpeg import decode_jpeg

        for pdf in batches:
            out = []
            for fb in pdf["frame"]:
                if fb is None:
                    out.append(None)
                    continue
                out.append(float(decode_jpeg(bytes(fb)).mean()))
            yield pd.DataFrame({"m": out})

    means = sampled.filter(F.col("err").isNull()).select("frame").mapInPandas(
        decode, schema=StructType([StructField("m", DoubleType())])
    )
    agg = means.agg(F.count("*").alias("n"), F.avg("m").alias("mu")).first()
    t3 = time.perf_counter()
    print(
        f"decode sampled frames: {t3 - t2:.1f}s "
        f"({agg['n'] / (t3 - t2):,.0f} frames decoded/s, mean {agg['mu']:.1f})",
        flush=True,
    )
    # video near-dup: per-sampled-frame pHash -> banded frame join ->
    # pairs surviving >= min_shared matches; planted floor = the
    # re-encoded every-10th clips
    from melodist_spark.pipeline.multimodal import (
        video_neardup_pairs,
        video_phash,
    )

    sig = video_phash(clips, every_n=every_n).persist()
    n_sig = sig.count()
    t4 = time.perf_counter()
    print(
        f"video_phash: {t4 - t3:.1f}s ({n_sig:,} frame hashes, "
        f"{n / (t4 - t3):,.0f} clips fingerprinted/s)",
        flush=True,
    )
    vpairs = video_neardup_pairs(sig, min_shared=2)
    planted = {(i - 1, i) for i in range(1, n_clips) if i % 10 == 9}
    got = {(r["id_a"], r["id_b"]) for r in vpairs.collect()}
    t5 = time.perf_counter()
    print(
        f"video_neardup_pairs: {t5 - t4:.1f}s ({len(got):,} pairs; "
        f"planted {len(planted)}, recalled "
        f"{len(planted & got)}/{len(planted)})",
        flush=True,
    )
    assert planted <= got, "planted re-encodes must all be recalled"
    print(f"TOTAL {t5 - t0:.1f}s", flush=True)
    sig.unpersist()
    sampled.unpersist()
    clips.unpersist()


if __name__ == "__main__":
    main()
