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
                frames = [
                    np.stack(
                        [
                            128 + 90 * np.sin(xx / 7 + t / 3 + i),
                            128 + 90 * np.cos(yy / 6 - t / 3),
                            (40 + 4 * t + i) % 256 + 0 * xx,
                        ],
                        axis=2,
                    ).clip(0, 255).astype(np.uint8)
                    for t in range(fpc)
                ]
                rows.append((i, "video", encode_avi_mjpeg(frames, fps=25)))
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
    print(f"TOTAL {t3 - t0:.1f}s", flush=True)
    sampled.unpersist()
    clips.unpersist()


if __name__ == "__main__":
    main()
