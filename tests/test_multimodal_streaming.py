"""Multimodal plumbing (stubbed decode, real Spark shape) and
Structured Streaming daily aggregation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from melodist_spark.pipeline.multimodal import (
    byte_histogram,
    decode_features,
    resize_stub,
    sample_frames,
)
from melodist_spark.streaming.daily_agg import (
    streaming_daily_from_hourly,
    streaming_gap_monitor,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", bytes(range(256)) * 8, 64, 32, None),
        (1, "video", bytes(10 * 1024), None, None, 5000),
        (2, "audio", b"\x01\x02" * 500, None, None, 2000),
        (3, "image", None, None, None, None),
    ]
    from melodist_spark.pipeline.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_decode_features_deterministic(media):
    a = decode_features(media).orderBy("media_id").toPandas()
    b = decode_features(media).orderBy("media_id").toPandas()
    assert len(a) == 4
    assert a["feature"].iloc[0] is not None and len(a["feature"].iloc[0]) == 64
    assert a["feature"].iloc[3] is None  # null payload stays null
    for x, y in zip(a["feature"], b["feature"]):
        if x is not None:
            np.testing.assert_allclose(x, y)


def test_decode_features_real_decoder_seam(media):
    """Round-7 (VERDICT item 8): the ``real_decoder=`` escape hatch is
    the 100 TB story's production path (GPU/turbojpeg stack instead of
    the numpy codecs) — prove the seam actually dispatches. The test
    double is keyed by payload content, so if decode_features silently
    fell back to numpy_media_decoder for ANY row (or dropped the
    ``dim`` threading), the per-row assertions below would fail."""

    def double(payload: bytes, dim: int) -> np.ndarray:
        # deterministic, content-keyed, obviously not a real decoder
        return np.full(dim, float(len(payload)), dtype=np.float64)

    got = (
        decode_features(media, dim=5, real_decoder=double)
        .orderBy("media_id")
        .toPandas()
    )
    assert len(got) == 4
    # every non-null payload went through the DOUBLE (len-valued
    # vectors of the overridden dim), including the "video" payload
    # that the default decoder would have routed to the fake
    expected_lens = [256 * 8, 10 * 1024, 1000]
    for feat, n in zip(got["feature"][:3], expected_lens):
        assert len(feat) == 5
        np.testing.assert_allclose(feat, np.full(5, float(n)))
    assert got["feature"].iloc[3] is None  # null payload short-circuits


def test_byte_histogram(media):
    got = byte_histogram(media).orderBy("media_id").toPandas()
    h0 = np.array(got["histogram"].iloc[0])
    assert h0.shape == (256,)
    np.testing.assert_allclose(h0.sum(), 1.0)
    np.testing.assert_allclose(h0, np.full(256, 1 / 256))  # uniform payload
    assert got["n_bytes"].iloc[1] == 10240


def test_sample_frames(media):
    got = sample_frames(media, every_n=3, frame_bytes=1024).orderBy("frame_idx").toPandas()
    # 10 frames, every 3rd → idx 0,3,6,9
    assert got["frame_idx"].tolist() == [0, 3, 6, 9]
    assert all(len(f) == 1024 for f in got["frame"])


def test_resize_is_marked_stub():
    with pytest.raises(NotImplementedError):
        resize_stub()


def _ppm_bytes(img):
    from melodist_spark.pipeline.multimodal import encode_ppm

    return encode_ppm(img)


def _bmp_bytes(img):
    """Build a minimal uncompressed 24-bit BMP (bottom-up, padded
    rows) from an (h, w, 3) RGB array."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in img[::-1]:  # bottom-up
        line = row[:, ::-1].astype(np.uint8).tobytes()  # RGB→BGR
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(body)


def _wav_bytes(samples, rate=8000):
    """Minimal 16-bit mono PCM WAV from a float array in [-1, 1]."""
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_numpy_codecs_roundtrip():
    from melodist_spark.pipeline.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        resize_nearest,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(_ppm_bytes(img)), img)
    gray = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(_ppm_bytes(gray)), gray)
    # PPM comments in the header are skipped
    commented = b"P6\n# a comment\n7 10\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(commented), img)
    np.testing.assert_array_equal(decode_bmp(_bmp_bytes(img)), img)

    wave = np.sin(np.linspace(0, 40 * np.pi, 4000))
    samples, rate = decode_wav(_wav_bytes(wave))
    assert rate == 8000 and samples.shape == (4000, 1)
    np.testing.assert_allclose(samples[:, 0], wave, atol=1e-3)

    big = resize_nearest(img, 20, 14)
    assert big.shape == (20, 14, 3)
    # nearest-neighbor: every output pixel is some input pixel
    assert set(np.unique(big)) <= set(np.unique(img))


def test_numpy_media_decoder_real_paths():
    from melodist_spark.pipeline.multimodal import (
        _fake_decode,
        numpy_media_decoder,
    )

    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    feat = numpy_media_decoder(_ppm_bytes(flat))
    np.testing.assert_allclose(feat, np.full(64, 128 / 255.0))

    silence = _wav_bytes(np.zeros(1000))
    np.testing.assert_allclose(numpy_media_decoder(silence), np.zeros(64))

    blob = b"\x89PNG not actually decodable here"
    np.testing.assert_allclose(
        numpy_media_decoder(blob), _fake_decode(blob)
    )


def test_resize_images_distributed(spark):
    from melodist_spark.pipeline.multimodal import decode_ppm, resize_images

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8) for _ in range(3)]
    rows = [(i, _ppm_bytes(img)) for i, img in enumerate(imgs)]
    rows.append((3, _bmp_bytes(imgs[0])))
    rows.append((4, b"JFIF-ish poison blob"))  # must not kill the job
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = resize_images(df, 8, 8).orderBy("media_id").toPandas()
    assert len(got) == 5
    ok = got[got["err"].isna()]
    assert set(ok["media_id"]) == {0, 1, 2, 3}
    for _, r in ok.iterrows():
        out = decode_ppm(bytes(r["payload"]))
        assert out.shape == (8, 8, 3)
    assert got[got["media_id"] == 4]["err"].notna().all()


def test_streaming_daily_agg(spark, tmp_path, met_hourly_pd):
    src = str(tmp_path / "stream_src")
    pdf = met_hourly_pd[met_hourly_pd.station_id == "s1"].head(24 * 10)
    spark.createDataFrame(pdf).write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = streaming_daily_from_hourly(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("daily_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from daily_stream").orderBy("date").toPandas()
    # append mode emits only windows older than the watermark (2 days):
    # 10 days of input → at least the first 7 close
    assert len(got) >= 7

    exp = (
        pdf.set_index("ts")["temp"].resample("D").mean().reset_index(name="t")
    )
    merged = got.merge(
        exp.assign(date=exp["ts"].dt.date), on="date", how="inner"
    )
    np.testing.assert_allclose(merged["temp"].values, merged["t"].values, rtol=1e-9)


def test_streaming_gap_monitor(spark, tmp_path, met_hourly_pd):
    src = str(tmp_path / "gap_src")
    pdf = met_hourly_pd[met_hourly_pd.station_id == "s1"].head(24 * 5)
    pdf = pdf.drop(pdf.index[30:35])  # punch a 5-hour hole in day 2
    spark.createDataFrame(pdf).write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    mon = streaming_gap_monitor(stream)
    q = (
        mon.writeStream.format("memory")
        .queryName("gap_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from gap_stream").orderBy("date").toPandas()
    assert (got["n_missing"] == 5).any()


def test_streaming_dedup_exact(spark, tmp_path):
    """Duplicates arriving in later micro-batches are dropped; first
    occurrences survive."""
    import pandas as pd
    from melodist_spark.streaming.dedup import streaming_dedup_exact

    src = str(tmp_path / "docs_stream")
    b1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02"]),
            "text": ["alpha", "beta", "alpha"],  # in-batch dup
        }
    )
    b2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "ts": pd.to_datetime(["2024-01-01 00:03", "2024-01-01 00:04"]),
            "text": ["beta", "gamma"],  # cross-batch dup + new
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dedup_exact(stream, ts_col="ts")
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select text from stream_dedup").toPandas()
    assert sorted(got["text"]) == ["alpha", "beta", "gamma"]


def test_streaming_curate_extract_html_ordering_contract(spark, tmp_path):
    """Round 9: extract_html=True is the composed-API form of the
    boilerplate->decontamination ordering contract — raw crawl HTML
    with shared chrome streams through the DOM extractor first, so
    short-gram decontamination flags exactly the planted overlap
    (and NO BoilerplateOrderingWarning fires); the same stream raw
    would have every document flagged through the chrome."""
    import warnings as _w

    import numpy as np

    from melodist_spark.pipeline.decontamination import (
        BoilerplateOrderingWarning,
        benchmark_gram_array,
    )
    from melodist_spark.streaming.ingest import streaming_curate

    nav = (
        '<nav><a href="/">Portal home page</a> <a href="/n">Breaking '
        'news desk</a> <a href="/c">Contact the editors</a></nav>'
    )
    planted = (
        "the migration of the eastern monarch butterfly spans four "
        "generations and more than four thousand kilometres every "
        "single calendar year"
    )
    rng = np.random.default_rng(31)
    vocab = [f"tok{i}" for i in range(500)]
    stop = ["the", "and", "of", "to", "is"]

    def body(i):
        ws = [
            stop[j % len(stop)] if j % 4 == 0 else str(rng.choice(vocab))
            for j in range(30)
        ]
        return " ".join(ws)

    def page(i, extra=""):
        return (
            f"<html><body>{nav}<article><p>{body(i)} {extra}</p>"
            "</article><footer>All rights reserved by the example "
            "media company</footer></body></html>"
        )

    rows = [(i, page(i, planted if i == 3 else "")) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench_page = spark.createDataFrame(
        [(100, page(100, planted))], "doc_id long, text string"
    )
    # worst case: the benchmark grams come from the RAW page (chrome
    # included) — with extraction upstream the chrome grams have
    # nothing to match against
    from melodist_spark.pipeline.text import html_to_text

    grams = benchmark_gram_array(
        bench_page.select(
            "doc_id", html_to_text(F.col("text")).alias("text")
        ),
        ngram=5,
    )

    src = str(tmp_path / "extract_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        curated = streaming_curate(
            stream, grams, min_tokens=20, ngram=5, extract_html=True
        )
        assert not any(
            issubclass(c.category, BoilerplateOrderingWarning)
            for c in caught
        )
    q = (
        curated.writeStream.format("memory")
        .queryName("extract_ingest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT doc_id, text_clean FROM extract_ingest"
    ).collect()
    got = {r["doc_id"] for r in out}
    # only the planted overlap is contaminated; the shared chrome
    # neither flags the other five nor survives into text_clean
    assert got == {0, 1, 2, 4, 5}
    for r in out:
        assert "Portal home page" not in r["text_clean"]
        assert "All rights reserved" not in r["text_clean"]

    # the raw form of the same stream warns AND flags everything
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        raw = streaming_curate(stream, grams, min_tokens=20, ngram=5)
        assert any(
            issubclass(c.category, BoilerplateOrderingWarning)
            for c in caught
        )
    q2 = (
        raw.writeStream.format("memory")
        .queryName("raw_ingest")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got_raw = {
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM raw_ingest").collect()
    }
    assert got_raw == set()  # chrome 5-grams contaminate every doc


def test_streaming_curate_end_to_end(spark, tmp_path):
    """The composed ingest pipeline (clean -> quality gate ->
    decontaminate -> dedup) on an availableNow stream keeps exactly
    the documents its batch-operator composition keeps."""
    import numpy as np

    from melodist_spark.pipeline.decontamination import (
        benchmark_gram_array,
        decontaminate_stateless,
    )
    from melodist_spark.pipeline.text import clean_text, quality_flags
    from melodist_spark.streaming.ingest import streaming_curate

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(80):
        # 4 stopwords of 44 tokens = 9% — ABOVE the 5% stopword gate.
        # (Round 10: the original " the a is" suffix was 2/43 = 4.65%
        # — 'a' is not in the en stopword list — so the quality gate
        # dropped ALL docs and the test compared empty sets; the
        # non-vacuity asserts below pin that this cannot recur.)
        rows.append((i, " ".join(rng.choice(vocab, size=40)) + " the is of the"))
    rows.append((100, rows[0][1]))          # exact dup — dropped by dedup
    # re-crawl of doc 1 differing only in boilerplate the cleaner
    # strips: must dedup against doc 1 (clean-text digest)
    rows.append((103, rows[1][1] + " https://t.example/track?id=9"))
    rows.append((101, "tiny"))              # fails min_tokens gate
    rows.append((102, rows[5][1] + " x"))   # shares 5-grams with bench doc 5
    # round 7: a mojibake'd re-crawl (UTF-8 read as cp1252) of a doc
    # with non-ASCII content must dedup against its clean twin — the
    # fix_text stage runs before the digest
    accented = rows[2][1] + " caf\u00e9 \u2014 na\u00efve"
    rows[2] = (rows[2][0], accented)
    rows.append(
        (104, rows[2][1].encode("utf-8").decode("cp1252", errors="replace"))
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    bench = docs.filter(F.col("doc_id") == 5)
    grams = benchmark_gram_array(bench, ngram=5)

    src = str(tmp_path / "stream_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_curate(
            stream, grams, min_tokens=20, text_is_extracted=True
        )
        .writeStream.format("memory")
        .queryName("curated_ingest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM curated_ingest").collect()
    }

    # batch reference: same operators composed the same way, all
    # gates on the repaired + cleaned text (streaming_curate runs
    # fix_text first)
    from melodist_spark.pipeline.text import fix_text

    cleaned = docs.withColumn("text_clean", clean_text(fix_text(F.col("text"))))
    gated = quality_flags(cleaned, text_col="text_clean", min_tokens=20).filter("keep")
    decon = decontaminate_stateless(
        gated,
        grams,
        text_col="text_clean",
        ngram=5,
        keep_payload=True,
        text_is_extracted=True,
    ).filter(~F.col("contaminated"))
    # exact dedup keep-first by min doc_id (streaming keeps first seen;
    # with one availableNow batch the kept member of a digest group is
    # arbitrary — compare at digest-group granularity)
    want_digests = {
        r["d"]
        for r in decon.select(F.md5("text_clean").alias("d")).distinct().collect()
    }
    got_digests = {
        r["d"]
        for r in spark.sql("SELECT * FROM curated_ingest")
        .select(F.md5("text_clean").alias("d"))
        .collect()
    }
    assert got_digests == want_digests
    # NON-VACUITY: the pipeline kept a real population (round 10 —
    # this test used to compare empty sets, see the fixture note)
    assert len(got) >= 70
    assert {0, 1, 3, 4} & got
    # gates actually fired
    assert not ({2, 104} <= got)   # mojibake'd re-crawl deduped vs twin
    assert 101 not in got          # quality gate
    assert 5 not in got and 102 not in got  # decontamination (5 ⊆ bench)
    assert not {1, 103} <= got     # boilerplate-only re-crawl deduped
    assert len(got) == len(got_digests)     # dedup: one doc per digest
    # clean column present on the survivors
    cols = spark.sql("SELECT * FROM curated_ingest").columns
    assert "text_clean" in cols


def test_streaming_curate_surgical_parity(spark, tmp_path):
    """Round 10 (VERDICT r9 item 7): ``surgical=True`` completes the
    flag→surgery story on a stream — contaminated documents keep
    their non-overlapping text (spans excised, zero residual) instead
    of being dropped, the audit columns mean the same thing on both
    slices, a mostly-benchmark page still dies on the min_tokens
    floor of what SURVIVED, and the availableNow run matches the
    batch composition of the same operators document-for-document."""
    import numpy as np

    from melodist_spark.pipeline.decontamination import (
        benchmark_gram_array,
        decontaminate_stateless,
        remove_contaminated_spans,
    )
    from melodist_spark.pipeline.text import clean_text, fix_text, quality_flags
    from melodist_spark.streaming.ingest import streaming_curate

    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(300)]
    planted = "alpha beta gamma delta epsilon zeta eta"  # 7 toks, 5-grams
    rows = []
    for i in range(30):
        # 4 stopwords of 44 = 9%, above the 5% stopword gate
        body = " ".join(rng.choice(vocab, size=40)) + " the is of the"
        if i % 6 == 2:
            # quotes the benchmark mid-document: must SURVIVE with
            # the quoted span excised (the old path dropped it whole)
            body = body[: len(body) // 2] + f" {planted} " + body[len(body) // 2 :]
        rows.append((i, body))
    # mostly-benchmark page: passes the quality gate (27 tokens, 22%
    # stopwords) but surgery excises all 21 planted tokens, leaving 6
    # — below the post-surgery min_tokens floor
    rows.append((100, " ".join([planted] * 3) + " the is of to and in"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    bench = spark.createDataFrame([(1000, planted)], ["doc_id", "text"])
    grams = benchmark_gram_array(bench, ngram=5)

    src = str(tmp_path / "surgical_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_curate(
            stream,
            grams,
            min_tokens=20,
            text_is_extracted=True,
            surgical=True,
        )
        .writeStream.format("memory")
        .queryName("surgical_ingest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r
        for r in spark.sql("SELECT * FROM surgical_ingest").collect()
    }

    # batch reference: same operators composed the same way
    cleaned = docs.withColumn("text_clean", clean_text(fix_text(F.col("text"))))
    gated = quality_flags(cleaned, text_col="text_clean", min_tokens=20).filter(
        "keep"
    )
    flagged = decontaminate_stateless(
        gated, grams, text_col="text_clean", ngram=5,
        keep_payload=True, text_is_extracted=True,
    )
    repaired = remove_contaminated_spans(
        flagged.filter("contaminated").drop(
            "n_ngrams", "n_hits", "overlap", "contaminated"
        ),
        grams,
        text_col="text_clean",
        ngram=5,
        text_is_extracted=True,
    ).filter("n_tokens_kept >= 20")
    want_texts = {
        r["doc_id"]: r["text_clean"]
        for r in flagged.filter("NOT contaminated").collect()
    } | {r["doc_id"]: r["text_clean"] for r in repaired.collect()}

    assert {i for i in got} == set(want_texts)
    for i, r in got.items():
        assert r["text_clean"] == want_texts[i], i

    # the quoting docs SURVIVED with the span excised
    quoting = [i for i in range(30) if i % 6 == 2]
    for i in quoting:
        assert i in got
        assert "alpha beta gamma" not in got[i]["text_clean"]
        assert got[i]["n_tokens_removed"] >= 7
    # the mostly-benchmark page died on the post-surgery floor
    assert 100 not in got
    # untouched docs: audit columns present and consistent
    clean_ids = [i for i in range(30) if i % 6 != 2]
    for i in clean_ids:
        assert got[i]["n_tokens_removed"] == 0
        assert got[i]["n_tokens_kept"] == len(got[i]["text_clean"].split())
    # zero residual on the whole surviving stream
    out = spark.sql("SELECT doc_id, text_clean FROM surgical_ingest")
    residue = decontaminate_stateless(
        out, grams, text_col="text_clean", ngram=5,
        keep_payload=True, text_is_extracted=True,
    )
    assert residue.filter("contaminated").count() == 0


def test_streaming_quality_classifier_gate(spark, tmp_path):
    """logreg_score is a pure column expression, so a model trained
    in batch gates a STREAMING ingest without any stateful operator —
    scores on the stream match the batch scores exactly."""
    from melodist_spark.pipeline.classifier import logreg_score, logreg_train
    from melodist_spark.pipeline.text import quality_features

    rows = []
    for i in range(30):
        rows.append((i, "the quick brown fox jumps over a lazy dog near the river " * 2))
    for i in range(30, 60):
        rows.append((i, "!!!! @@@@ #### %%%% " * 8))
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    feats = quality_features(batch).na.fill(0.0).withColumn(
        "label", (F.col("doc_id") < 30).cast("double")
    )
    cols = ["n_tokens", "mean_word_len", "stopword_ratio", "punct_ratio"]
    model = logreg_train(feats, cols, "label", iters=5)

    src = str(tmp_path / "docs_src")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    scored = logreg_score(
        quality_features(stream).na.fill(0.0), model
    ).filter(F.col("quality_score") > 0.5)
    out = str(tmp_path / "gated")
    q = (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    assert set(got["doc_id"]) == set(range(30))  # clean docs pass the gate
    ref = (
        logreg_score(quality_features(batch).na.fill(0.0), model)
        .select("doc_id", "quality_score").toPandas().set_index("doc_id")
    )
    for _, r in got.iterrows():
        assert abs(ref.loc[r["doc_id"], "quality_score"] - r["quality_score"]) < 1e-12


def _png_filter_row(f, cur, prev, bpp):
    """Reference PNG filter APPLICATION (spec forward direction) for
    pinning the decoder's unfilter: given reconstructed rows, produce
    the filtered raw bytes."""
    import numpy as np

    w = len(cur)
    out = np.zeros(w, dtype=np.uint8)
    for x in range(w):
        a = int(cur[x - bpp]) if x >= bpp else 0          # left
        b = int(prev[x])                                   # up
        c = int(prev[x - bpp]) if x >= bpp else 0          # upper-left
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) // 2
        else:  # paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(cur[x]) - pred) & 0xFF
    return out


def _build_png(img, row_filters):
    """Hand-assemble a PNG with a CHOSEN filter per scanline — the
    encoder only emits filter 0, so this is what exercises
    Sub/Up/Average/Paeth in the decoder."""
    import zlib

    import numpy as np

    from melodist_spark.pipeline.multimodal import _PNG_SIG

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c)
    raster = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        f = row_filters[y % len(row_filters)]
        raster.append(f)
        raster.extend(_png_filter_row(f, flat[y], prev, c).tobytes())
        prev = flat[y]

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raster)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_color_types():
    """encode_png -> decode_png is lossless for gray/GA/RGB/RGBA."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in [(13, 7), (13, 7, 2), (9, 11, 3), (6, 5, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(img))
        assert got.shape == img.shape
        assert (got == img).all(), shape


def test_png_decoder_inverts_every_filter_type():
    """Each of the five spec filters (None/Sub/Up/Average/Paeth),
    applied per scanline by an independent reference implementation
    of the spec's FORWARD direction, must be inverted exactly."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import decode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    for f in range(5):
        got = decode_png(_build_png(img, [f]))
        assert (got == img).all(), f"filter {f} not inverted"
    # mixed filters across rows
    got = decode_png(_build_png(img, [0, 1, 2, 3, 4]))
    assert (got == img).all()


def test_png_palette_and_trns():
    import zlib

    import numpy as np

    from melodist_spark.pipeline.multimodal import _PNG_SIG, decode_png

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    h, w = idx.shape

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    raster = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    base = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
    png = base + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
    got = decode_png(png)
    assert got.shape == (2, 3, 3)
    assert (got == pal[idx]).all()
    # tRNS adds per-palette-entry alpha
    png_a = (
        base + chunk(b"tRNS", bytes([10, 20]))
        + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
    )
    got_a = decode_png(png_a)
    assert got_a.shape == (2, 3, 4)
    assert (got_a[:, :, :3] == pal[idx]).all()
    assert (got_a[:, :, 3] == np.array([[10, 20, 255], [255, 20, 10]])).all()


def test_png_gets_real_features_and_resize(spark):
    """PNG payloads now take the REAL decode path: identical pixels
    as PPM give identical features (and differ from the sha-fake),
    and resize_images round-trips PNG -> PNG."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import (
        _fake_decode,
        decode_png,
        encode_png,
        encode_ppm,
        numpy_media_decoder,
        resize_images,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    f_png = numpy_media_decoder(encode_png(img))
    f_ppm = numpy_media_decoder(encode_ppm(img))
    assert np.allclose(f_png, f_ppm)  # same pixels, same real features
    assert not np.allclose(f_png, _fake_decode(encode_png(img)))

    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)))], "media_id long, payload binary"
    )
    out = resize_images(df, 4, 4).collect()[0]
    assert out["err"] is None and out["width"] == 4
    small = decode_png(bytes(out["payload"]))
    assert small.shape == (4, 4, 3)


def test_jpeg_spec_constants_and_dct():
    """Component pins independent of the codec round-trip: the DCT
    matrix built from the textbook formula must be orthonormal (so
    forward and inverse are exact transposes — a zigzag or transform
    bug cannot hide behind a consistent inverse), and the zigzag
    constant must be the spec's diagonal walk."""
    import numpy as np

    from melodist_spark.pipeline.jpeg import ZIGZAG, dct_matrix

    C = dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)
    # DCT-II row 0 is the flat basis; row 1 ordered cosine
    assert np.allclose(C[0], np.sqrt(1 / 8.0))
    assert (np.diff(C[1]) < 0).all()
    # zigzag: permutation; spot-pin the spec's first diagonal walks
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]


def test_jpeg_roundtrip_modes():
    """Round-trips a correct lossy codec must meet: DC-only images
    exact, q=100 near-lossless even on noise (all-ones quant table ->
    only DCT rounding), smooth content tightly bounded across 4:4:4 /
    4:2:0 and restart intervals, and shapes preserved for odd
    (non-MCU-aligned) dimensions."""
    import numpy as np

    from melodist_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    # constant gray: DC-only, exact
    img = np.full((16, 24), 130, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(img, quality=90)) == img).all()

    # q=100 on pure noise: only DCT rounding survives
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(noise, quality=100))
    err = np.abs(got.astype(int) - noise.astype(int))
    assert err.mean() < 1.0 and err.max() <= 4

    # smooth gradient across modes and odd shapes
    grad = np.dstack(
        [
            np.linspace(0, 200, 41)[None, :].repeat(33, 0),
            np.linspace(30, 220, 33)[:, None].repeat(41, 1),
            np.full((33, 41), 100.0),
        ]
    ).astype(np.uint8)
    for sub in (False, True, "422"):
        for dri in (0, 2):
            got = decode_jpeg(
                encode_jpeg(grad, quality=90, subsample=sub, restart_interval=dri)
            )
            assert got.shape == grad.shape
            err = np.abs(got.astype(int) - grad.astype(int))
            assert err.mean() < 6, (sub, dri, err.mean())
            assert err.max() < 40, (sub, dri, err.max())


def test_jpeg_rejects_unsupported():
    import numpy as np
    import pytest

    from melodist_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 -> SOF2 in a BASELINE stream: progressive is now
    # decoded for real (round 7), but a baseline SOS (Ss=0..Se=63)
    # inside a progressive frame violates Annex G's band rules and
    # must refuse loudly, not emit garbage pixels
    img = np.full((8, 8), 99, dtype=np.uint8)
    raw = bytearray(encode_jpeg(img))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(raw))
    # lossless (SOF3) still refuses
    raw[i + 1] = 0xC3
    with pytest.raises(ValueError, match="frame type"):
        decode_jpeg(bytes(raw))


def test_jpeg_gets_real_features_and_resize(spark):
    """JPEG payloads now take the REAL decode path end-to-end through
    the Spark operators: features match the same pixels via PPM to
    within JPEG loss, and resize_images round-trips JPEG -> JPEG."""
    import numpy as np

    from melodist_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
    from melodist_spark.pipeline.multimodal import (
        _fake_decode,
        encode_ppm,
        numpy_media_decoder,
        resize_images,
    )

    grad = np.dstack(
        [
            np.linspace(0, 200, 32)[None, :].repeat(32, 0),
            np.linspace(30, 220, 32)[:, None].repeat(32, 1),
            np.full((32, 32), 100.0),
        ]
    ).astype(np.uint8)
    f_jpg = numpy_media_decoder(encode_jpeg(grad, quality=95))
    f_ppm = numpy_media_decoder(encode_ppm(grad))
    assert np.abs(f_jpg - f_ppm).max() < 0.05  # same pixels mod loss
    assert not np.allclose(f_jpg, _fake_decode(encode_jpeg(grad)))

    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(grad, quality=95)))],
        "media_id long, payload binary",
    )
    out = resize_images(df, 8, 8).collect()[0]
    assert out["err"] is None and out["width"] == 8
    small = decode_jpeg(bytes(out["payload"]))
    assert small.shape == (8, 8, 3)


def test_gif_roundtrip_and_interlace():
    """encode_gif -> decode_gif lossless for palette images (incl. a
    dict-overflow stream that forces a mid-stream CLEAR); interlaced
    frames are rebuilt by hand with the 4-pass row order and must
    decode to the same pixels as the sequential encoding."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, size=(21, 13))
    img = pal[idx]
    raw = encode_gif(img)
    assert (decode_gif(raw) == img).all()

    # dict overflow -> mid-stream CLEAR
    big_idx = rng.integers(0, 250, size=(150, 200))
    big_pal = rng.integers(0, 256, size=(250, 3), dtype=np.uint8)
    big = big_pal[big_idx]
    assert (decode_gif(encode_gif(big)) == big).all()

    # interlace: permute the encoded frame's rows into 4-pass order
    # and set the interlace flag; decode must undo it
    h = img.shape[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8),
         np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    inter = encode_gif(img[order])
    buf = bytearray(inter)
    # image descriptor starts after header(13) + GCT; find 0x2C
    i = 13 + (2 << (buf[10] & 7)) * 3
    assert buf[i] == 0x2C
    buf[i + 9] |= 0x40  # interlace flag
    assert (decode_gif(bytes(buf)) == img).all()


def test_gif_real_features_resize_and_fuzz(spark):
    import numpy as np

    from melodist_spark.pipeline.multimodal import (
        _fake_decode,
        decode_gif,
        encode_gif,
        encode_ppm,
        numpy_media_decoder,
        resize_images,
    )

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 32, size=(16, 16))]
    f_gif = numpy_media_decoder(encode_gif(img))
    f_ppm = numpy_media_decoder(encode_ppm(img))
    assert np.allclose(f_gif, f_ppm)  # lossless -> identical features
    assert not np.allclose(f_gif, _fake_decode(encode_gif(img)))

    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(img)))], "media_id long, payload binary"
    )
    out = resize_images(df, 4, 4).collect()[0]
    assert out["err"] is None
    small = decode_gif(bytes(out["payload"]))
    assert small.shape == (4, 4, 3)

    # poison-blob: corrupt bytes resolve to ValueError, nothing else
    for seed in range(80):
        r = np.random.default_rng(seed)
        raw = bytearray(encode_gif(img))
        pos = 6 + int(r.integers(0, len(raw) - 7))
        raw[pos] ^= int(r.integers(1, 255))
        try:
            got = decode_gif(bytes(raw))
            assert isinstance(got, np.ndarray)
        except ValueError:
            pass


def test_flac_roundtrip_modes():
    """Lossless round-trips across the encoder's emission surface:
    mono/stereo, independent + mid/side decorrelation, constant and
    wasted-bits subframes, multi-block streams with odd tails,
    16- and 24-bit depth."""
    import numpy as np

    from melodist_spark.pipeline.flac import decode_flac, encode_flac

    rng = np.random.default_rng(11)
    t = np.arange(5000)
    mono = (np.sin(t * 0.03) * 12000 + rng.normal(0, 300, len(t))).astype(
        np.int64
    )
    raw = encode_flac(mono, rate=16000, block=1024)
    got, rate, bps = decode_flac(raw)
    assert rate == 16000 and bps == 16 and (got[:, 0] == mono).all()
    assert len(raw) < len(mono) * 2  # actually compresses

    L = (np.sin(t * 0.02) * 9000).astype(np.int64)
    R = L + rng.integers(-50, 50, len(t))
    st = np.stack([L, R], axis=1)
    for ms in (False, True):
        got, rate, _ = decode_flac(
            encode_flac(st, rate=44100, block=1024, mid_side=ms)
        )
        assert rate == 44100 and (got == st).all()

    c = np.full(3000, 4096, dtype=np.int64)
    assert (decode_flac(encode_flac(c))[0][:, 0] == c).all()
    w = (rng.integers(-100, 100, 2000) * 8).astype(np.int64)
    assert (decode_flac(encode_flac(w))[0][:, 0] == w).all()
    x24 = rng.normal(0, 1e6, 2048).astype(np.int64)
    assert (decode_flac(encode_flac(x24, bps=24))[0][:, 0] == x24).all()


def test_flac_decodes_lpc_and_partitioned_residual():
    """Paths the test encoder never emits, built bit-by-bit from the
    spec and checked against an independent numpy recurrence: an LPC
    subframe (order 3, quantized coefficients, shift), a partition
    order > 0 residual, and the raw-bits escape partition."""
    import numpy as np

    from melodist_spark.pipeline.flac import _Bits, _decode_subframe, _BitW

    def build_lpc(warm, coefs, prec, shift, resid, n, bps, porder=0, escape_bits=None):
        bw = _BitW()
        bw.write(0, 1)
        bw.write(32 + len(coefs) - 1, 6)  # LPC, order
        bw.write(0, 1)  # no wasted bits
        for v in warm:
            bw.write(int(v), bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(int(c), prec)
        bw.write(0, 2)  # 4-bit rice method
        bw.write(porder, 4)
        nparts = 1 << porder
        k = 0
        for p in range(nparts):
            cnt = n // nparts - (len(coefs) if p == 0 else 0)
            if escape_bits is not None and p == nparts - 1:
                bw.write(15, 4)  # escape
                bw.write(escape_bits, 5)
                for _ in range(cnt):
                    bw.write(int(resid[k]), escape_bits)
                    k += 1
            else:
                param = 4
                bw.write(param, 4)
                for _ in range(cnt):
                    v = int(resid[k])
                    u = (v << 1) ^ (v >> 63)
                    bw.write_unary(u >> param)
                    bw.write(u & ((1 << param) - 1), param)
                    k += 1
        bw.align()
        return bytes(bw.buf)

    rng = np.random.default_rng(3)
    n, bps = 64, 16
    warm = [100, -50, 25]
    coefs = [205, -110, 37]  # Q: shift 8
    prec, shift = 12, 8
    resid = rng.integers(-40, 40, n - len(warm))

    # independent reference recurrence
    exp = np.zeros(n, dtype=np.int64)
    exp[:3] = warm
    for i in range(3, n):
        pred = sum(coefs[j] * exp[i - 1 - j] for j in range(3))
        exp[i] = resid[i - 3] + (pred >> shift)

    for porder, esc in ((0, None), (2, None), (2, 10)):
        raw = build_lpc(warm, coefs, prec, shift, resid, n, bps,
                        porder=porder, escape_bits=esc)
        got = _decode_subframe(_Bits(raw), n, bps)
        assert (got == exp).all(), (porder, esc)


def test_flac_features_and_poison(spark):
    import numpy as np

    from melodist_spark.pipeline.flac import decode_flac, encode_flac
    from melodist_spark.pipeline.multimodal import (
        _fake_decode,
        numpy_media_decoder,
    )

    t = np.arange(8000)
    x = (np.sin(t * 0.05) * 16000).astype(np.int64)
    payload = encode_flac(x, rate=8000)
    feat = numpy_media_decoder(payload)
    assert np.isfinite(feat).all() and feat.max() > 0.1  # real RMS energy
    assert not np.allclose(feat, _fake_decode(payload))
    # matches the WAV path on the same signal (both peak-ish scaled)
    from tests.test_multimodal_streaming import _wav_bytes

    f_wav = numpy_media_decoder(_wav_bytes(x / 32768.0))
    assert np.abs(feat - f_wav).max() < 0.05

    # poison: bitflips resolve to ValueError or a decode, never leak
    for seed in range(60):
        r = np.random.default_rng(seed)
        raw = bytearray(payload)
        pos = 4 + int(r.integers(0, len(raw) - 5))
        raw[pos] ^= int(r.integers(1, 255))
        try:
            out, _, _ = decode_flac(bytes(raw))
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass


def test_wav_g711_mulaw_alaw():
    """G.711 telephony WAV (format 6 = A-law, 7 = mu-law): spec table
    anchor points pin the expanders, and a companded sine decodes
    within companding error of the original."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import (
        _alaw_decode,
        _ulaw_decode,
        decode_wav,
    )

    # canonical anchor values from the G.711 tables
    assert _ulaw_decode(np.array([0xFF]))[0] == 0
    assert _ulaw_decode(np.array([0x00]))[0] == -32124
    assert _ulaw_decode(np.array([0x80]))[0] == 32124
    assert _alaw_decode(np.array([0xD5]))[0] == 8
    assert _alaw_decode(np.array([0x55]))[0] == -8
    assert _alaw_decode(np.arange(256)).max() == 32256

    def g711_wav(fmt_code, payload, rate=8000):
        fmt = (
            fmt_code.to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little") + rate.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        )
        chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        chunks += b"data" + len(payload).to_bytes(4, "little") + payload
        return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks

    # mu-law COMPRESS (reference forward transform) of a sine, then
    # decode through the WAV path and compare within companding error
    x = (np.sin(np.arange(800) * 0.05) * 20000).astype(np.int64)

    def ulaw_encode(v):
        BIAS = 0x84
        sign = (v < 0).astype(np.int64)
        mag = np.minimum(np.abs(v) + BIAS, 0x7FFF)
        exp = np.floor(np.log2(mag)).astype(np.int64) - 7
        exp = np.clip(exp, 0, 7)
        mant = (mag >> (exp + 3)) & 0x0F
        return (~((sign << 7) | (exp << 4) | mant)) & 0xFF

    enc = ulaw_encode(x).astype(np.uint8).tobytes()
    samples, rate = decode_wav(g711_wav(7, enc))
    assert rate == 8000 and samples.shape == (800, 1)
    err = np.abs(samples[:, 0] * 32768.0 - x)
    # mu-law quantization error is bounded by the segment step
    assert err.max() < 1024 and err.mean() < 300


def test_flac_long_stream_utf8_frame_numbers():
    """Frame numbers >= 128 use the multi-byte UTF-8 envelope — a
    round-6 self-review caught the writer emitting a malformed lead
    byte there (latent: short test streams never crossed 128 frames).
    300 frames pins 1- and 2-byte forms end to end."""
    import numpy as np

    from melodist_spark.pipeline.flac import decode_flac, encode_flac

    rng = np.random.default_rng(21)
    x = rng.integers(-3000, 3000, size=300 * 64).astype(np.int64)
    got, rate, bps = decode_flac(encode_flac(x, rate=8000, block=64))
    assert (got[:, 0] == x).all()


def test_sample_frames_real_gif_animation(spark):
    """Round-7: animated GIF payloads are frame-sampled for REAL —
    composited frames come back as standalone GIF images that the
    rest of the media pipeline can decode — while non-GIF video
    payloads keep the fixed-size-framing stub shape, and a poison
    GIF becomes an error row instead of a task failure."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        decode_gif,
        encode_gif_frames,
        sample_frames,
    )

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 5, size=(6, 8, 3), dtype=np.uint8) * 50 for _ in range(7)]
    anim = encode_gif_frames(frames, delays_cs=[3 * (i + 1) for i in range(7)])
    rows = [
        (0, "video", anim, None, None, 700),
        (1, "video", bytes(5 * 1024), None, None, 5000),
        (2, "video", b"GIF89a" + b"\x00" * 40, None, None, 100),  # poison
        (3, "image", anim, None, None, None),  # not video-typed: excluded
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = sample_frames(df, every_n=3, frame_bytes=1024).orderBy(
        "media_id", "frame_idx"
    ).toPandas()

    gif_rows = got[(got["codec"] == "gif") & got["err"].isna()]
    assert gif_rows["frame_idx"].tolist() == [0, 3, 6]
    assert gif_rows["delay_cs"].tolist() == [3, 12, 21]
    for fi, frame in zip((0, 3, 6), gif_rows["frame"]):
        assert (decode_gif(bytes(frame)) == frames[fi]).all()
    assert set(gif_rows["height"]) == {6} and set(gif_rows["width"]) == {8}

    raw_rows = got[got["codec"] == "raw"]
    assert raw_rows["frame_idx"].tolist() == [0, 3]
    assert all(len(bytes(f)) == 1024 for f in raw_rows["frame"])

    err_rows = got[got["err"].notna()]
    assert len(err_rows) == 1 and err_rows["media_id"].iloc[0] == 2
    assert int((got["media_id"] == 3).sum()) == 0


# -- image dHash near-dup (round 7) -------------------------------------


def _seed_image(seed: int, h: int = 40, w: int = 40) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _one_bit_edit(img: np.ndarray) -> np.ndarray:
    """Flip EXACTLY one dHash bit: the 9x8 nearest grid samples pixel
    (2, 2) into small[0, 0], which feeds only bit (0, 0) =
    small[0,1] > small[0,0] — drive that comparison to its other
    outcome by saturating the one sampled pixel."""
    gray = img.mean(axis=2)
    edited = img.copy()
    edited[2, 2] = 255 if gray[2, 6] > gray[2, 2] else 0
    return edited


def test_dhash64_kernel_properties():
    """dHash is stable under re-encoding (PNG vs PPM of the same
    pixels), moves only a few bits under a small local edit, far for
    unrelated images, and null for audio/corrupt payloads."""
    from melodist_spark.pipeline.multimodal import (
        dhash64,
        encode_png,
        encode_ppm,
    )

    img = _seed_image(1)
    h_png = dhash64(encode_png(img))
    h_ppm = dhash64(encode_ppm(img))
    assert h_png is not None and h_png == h_ppm  # container-invariant

    # a deterministic one-sampled-pixel edit moves exactly one bit
    h_edit = dhash64(encode_png(_one_bit_edit(img)))
    assert bin((h_png ^ h_edit) & (2**64 - 1)).count("1") == 1

    other = _seed_image(2)
    h_other = dhash64(encode_png(other))
    assert bin((h_png ^ h_other) & (2**64 - 1)).count("1") > 10

    assert dhash64(b"RIFF....WAVE") is None  # audio-shaped: no dHash
    assert dhash64(b"\x89PNG\r\n\x1a\ntruncated") is None  # corrupt
    # signed packing round-trips a hash with the top bit set
    assert isinstance(h_png, int) and -(2**63) <= h_png < 2**63


def test_image_dhash_and_neardup_pairs(spark):
    """End-to-end: PNG payloads -> Arrow-batched dHash ingest -> the
    banded (skew-guarded) candidate join -> codegen bit_count verify.
    Planted: 10<->11 near-dup (small edit), 12 is 10's exact
    re-encode via PPM (distance 0); seeds 1-3 mutually unrelated;
    one audio row and one null payload produce null hashes and never
    reach the join."""
    from melodist_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        dhash_neardup_pairs,
        encode_png,
        encode_ppm,
        image_dhash,
    )

    base = _seed_image(1)
    edited = _one_bit_edit(base)
    rows = [
        (10, "image", encode_png(base), 40, 40, None),
        (11, "image", encode_png(edited), 40, 40, None),
        (12, "image", encode_ppm(base), 40, 40, None),
        (20, "image", encode_png(_seed_image(2)), 40, 40, None),
        (30, "image", encode_png(_seed_image(3)), 40, 40, None),
        (40, "audio", b"\x01\x02" * 500, None, None, 2000),
        (50, "image", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    hashes = image_dhash(media)
    got = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert got[40] is None and got[50] is None
    assert got[10] == got[12]  # exact pixels, different container

    pairs = dhash_neardup_pairs(hashes, max_distance=3, num_bands=6)
    found = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in pairs.collect()
    }
    assert found[(10, 12)] == 0
    assert (10, 11) in found and 0 < found[(10, 11)] <= 3
    assert (11, 12) in found  # transitively near 10's re-encode
    assert not any(20 in p or 30 in p or 40 in p or 50 in p for p in found)


def test_dhash_neardup_pairs_guards_recall():
    from melodist_spark.pipeline.multimodal import dhash_neardup_pairs

    with pytest.raises(ValueError, match="num_bands"):
        dhash_neardup_pairs(None, max_distance=4, num_bands=4)


def test_audio_fingerprint_invariances(spark):
    """The audio fingerprint is level-invariant (half-gain copy hashes
    identically), container-invariant (same signal via WAV and FLAC),
    near for a lightly-perturbed copy, far for a different signal,
    and null for images; the same banded join finds the planted pair
    via hash_col='afp'."""
    from melodist_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        audio_fingerprint64,
        dhash_neardup_pairs,
        encode_png,
    )
    from melodist_spark.pipeline.flac import encode_flac

    rng = np.random.default_rng(7)
    t = np.arange(16000) / 8000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) * (
        0.2 + np.abs(np.sin(2 * np.pi * 1.3 * t))
    )
    h_wav = audio_fingerprint64(_wav_bytes(sig))
    assert h_wav is not None

    # level invariance: -6 dB copy, identical fingerprint
    assert audio_fingerprint64(_wav_bytes(0.5 * sig)) == h_wav

    # container invariance: identical int16 samples through FLAC
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int64)
    h_flac = audio_fingerprint64(encode_flac(pcm, rate=8000, bps=16))
    assert h_flac == h_wav

    # mild noise moves few bits; a different signal moves many
    noisy = sig + rng.normal(0, 0.002, len(sig))
    d_noise = bin(
        (h_wav ^ audio_fingerprint64(_wav_bytes(noisy))) & (2**64 - 1)
    ).count("1")
    other = 0.4 * np.sin(2 * np.pi * 997 * t) * np.hanning(len(t))
    d_other = bin(
        (h_wav ^ audio_fingerprint64(_wav_bytes(other))) & (2**64 - 1)
    ).count("1")
    assert d_noise <= 3 < d_other

    # not audio -> None
    assert audio_fingerprint64(encode_png(_seed_image(1))) is None

    rows = [
        (1, "audio", _wav_bytes(sig), None, None, 2000),
        (2, "audio", _wav_bytes(noisy), None, None, 2000),
        (3, "audio", _wav_bytes(other), None, None, 2000),
        (4, "image", encode_png(_seed_image(1)), 40, 40, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    fps = audio_fingerprint(media)
    assert {r["media_id"]: r["afp"] for r in fps.collect()}[4] is None
    pairs = dhash_neardup_pairs(
        fps, hash_col="afp", max_distance=3, num_bands=6
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert found == {(1, 2)}


def test_image_dedup_composition_keep_one(spark):
    """The families compose: dHash near-dup pairs feed the SAME
    connected-components clustering as text dedup, and keep-one-per-
    cluster drops every re-encode/near-copy while unique images
    survive. 12 images: 4 originals, one with a PPM re-encode AND a
    one-bit edit (3-member cluster), one with a re-encode (2-member),
    plus 6 unrelated."""
    from melodist_spark.pipeline.dedup import duplicate_clusters
    from melodist_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        dhash_neardup_pairs,
        encode_png,
        encode_ppm,
        image_dhash,
    )

    base0, base1 = _seed_image(100), _seed_image(101)
    rows = [
        (0, "image", encode_png(base0), 40, 40, None),
        (1, "image", encode_ppm(base0), 40, 40, None),        # re-encode
        (2, "image", encode_png(_one_bit_edit(base0)), 40, 40, None),
        (3, "image", encode_png(base1), 40, 40, None),
        (4, "image", encode_ppm(base1), 40, 40, None),        # re-encode
    ] + [
        (10 + i, "image", encode_png(_seed_image(200 + i)), 40, 40, None)
        for i in range(6)
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    hashes = image_dhash(media).persist()
    pairs = dhash_neardup_pairs(hashes, max_distance=3, num_bands=6)
    clusters = duplicate_clusters(
        pairs.select("id_a", "id_b"), id_a="id_a", id_b="id_b"
    )
    got = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] != got[0]
    assert all(i not in got for i in range(10, 16))  # uniques untouched

    # keep-one: representative = cluster min, survivors = all - dropped
    keep = hashes.join(
        clusters.filter(F.col("id") != F.col("cluster_id")),
        hashes["media_id"] == F.col("id"),
        "left_anti",
    )
    kept = sorted(r["media_id"] for r in keep.collect())
    assert kept == [0, 3] + list(range(10, 16))
    hashes.unpersist()


# -- MJPEG/AVI video (round 7) ------------------------------------------


def _smooth_frames(n: int = 5, h: int = 24, w: int = 32):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        f = np.stack(
            [
                128 + 80 * np.sin(xx / 9 + t / 2),
                128 + 80 * np.cos(yy / 8 - t / 2),
                60 + 8 * t + 0 * xx,
            ],
            axis=2,
        ).clip(0, 255).astype(np.uint8)
        out.append(f)
    return out


def _strip_dht(jpeg: bytes) -> bytes:
    """Remove every DHT segment — the Microsoft MJPEG convention."""
    out = bytearray(jpeg[:2])
    j, n = 2, len(jpeg)
    while j + 4 <= n:
        m = jpeg[j + 1]
        if m == 0xDA:
            out += jpeg[j:]
            break
        seglen = int.from_bytes(jpeg[j + 2 : j + 4], "big")
        if m != 0xC4:
            out += jpeg[j : j + 2 + seglen]
        j += 2 + seglen
    return bytes(out)


def test_avi_mjpeg_roundtrip_and_sampling():
    """encode_avi_mjpeg -> parse_avi/decode_avi_frames round-trip:
    container metadata exact, sampled frames pixel-close (JPEG is
    lossy), unsampled frames never touched, truncation rejected."""
    from melodist_spark.pipeline.avi import (
        decode_avi_frames,
        encode_avi_mjpeg,
        frame_dimensions,
        parse_avi,
    )

    frames = _smooth_frames(7)
    avi = encode_avi_mjpeg(frames, fps=25, quality=92)
    meta = parse_avi(avi)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["usec_per_frame"] == 40000
    assert meta["n_frames"] == 7 and len(meta["frames"]) == 7
    assert meta["handler"] == "MJPG"

    dec = decode_avi_frames(avi, every_n=3)
    assert [i for i, _, _ in dec] == [0, 3, 6]
    assert all(d == 4 for _, d, _ in dec)  # 40000 us = 4 cs
    for i, _, rgb in dec:
        assert rgb.shape == (24, 32, 3)
        err = np.abs(rgb.astype(int) - frames[i].astype(int)).mean()
        assert err < 12.0

    off, size = meta["frames"][2]
    assert frame_dimensions(avi[off : off + size]) == (24, 32)

    with pytest.raises(ValueError):
        parse_avi(avi[: len(avi) // 2])
    dec2 = decode_avi_frames(avi, every_n=2, max_frames=2)
    assert [i for i, _, _ in dec2] == [0, 2]


def test_avi_tableless_mjpeg_frames_decode():
    """DHT-stripped frames (what real MJPEG hardware writes) decode
    identically to their table-carrying twins via the decoder's
    Annex K.3 fallback."""
    from melodist_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    f = _smooth_frames(1)[0]
    full = encode_jpeg(f, quality=90)
    stripped = _strip_dht(full)
    assert len(stripped) < len(full)  # something was actually removed
    assert np.array_equal(decode_jpeg(stripped), decode_jpeg(full))


def test_sample_frames_real_avi(spark):
    """sample_frames treats MJPEG/AVI as a REAL video container:
    sampled 00dc chunks come back verbatim as standalone-decodable
    codec='jpeg' rows (h/w from a header walk, delay from the
    container clock) — including an archive whose frames omit DHT —
    and a corrupt AVI becomes an error row, not a task failure."""
    from melodist_spark.pipeline.avi import encode_avi_mjpeg, parse_avi
    from melodist_spark.pipeline.jpeg import decode_jpeg
    from melodist_spark.pipeline.multimodal import MEDIA_SCHEMA, sample_frames

    frames = _smooth_frames(6)
    avi = encode_avi_mjpeg(frames, fps=10, quality=92)

    # rebuild the same container with table-less frames by surgical
    # byte replacement (offsets shift, so rebuild via the encoder's
    # chunk layout: strip each frame then re-wrap through parse)
    meta = parse_avi(avi)
    stripped_frames = [
        _strip_dht(avi[o : o + s]) for o, s in meta["frames"]
    ]
    import struct as _struct

    body = b"movi"
    for j in stripped_frames:
        pad = b"\x00" if len(j) & 1 else b""
        body += b"00dc" + _struct.pack("<I", len(j)) + j + pad
    movi = b"LIST" + _struct.pack("<I", len(body)) + body
    # splice: everything before the old movi LIST + new movi (no idx1)
    movi_pos = avi.find(b"movi") - 8
    pre = avi[12:movi_pos]
    riff_body = b"AVI " + pre + movi
    tableless = (
        b"RIFF" + _struct.pack("<I", len(riff_body)) + riff_body
    )

    rows = [
        (0, "video", avi, None, None, None),
        (1, "video", tableless, None, None, None),
        (2, "video", b"RIFF\x10\x00\x00\x00AVI LIST", None, None, None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = (
        sample_frames(df, every_n=2)
        .orderBy("media_id", "frame_idx")
        .toPandas()
    )

    ok = got[(got["media_id"] == 0) & got["err"].isna()]
    assert ok["frame_idx"].tolist() == [0, 2, 4]
    assert ok["codec"].tolist() == ["jpeg"] * 3
    assert ok["delay_cs"].tolist() == [10] * 3  # 10 fps = 10 cs
    assert set(ok["height"]) == {24} and set(ok["width"]) == {32}
    for fi, fb in zip((0, 2, 4), ok["frame"]):
        rgb = decode_jpeg(bytes(fb))
        err = np.abs(rgb.astype(int) - frames[fi].astype(int)).mean()
        assert err < 12.0

    tl = got[(got["media_id"] == 1) & got["err"].isna()]
    assert tl["frame_idx"].tolist() == [0, 2, 4]
    for fi, fb in zip((0, 2, 4), tl["frame"]):
        assert bytes(fb)[:2] == b"\xff\xd8"
        rgb = decode_jpeg(bytes(fb))  # standalone despite missing DHT
        assert rgb.shape == (24, 32, 3)

    bad = got[got["media_id"] == 2]
    assert len(bad) == 1 and bad["err"].notna().all()
    assert bad["codec"].iloc[0] == "avi"


def test_wav_ima_adpcm_roundtrip_and_spec_vector():
    """IMA/DVI ADPCM WAV (format 0x0011, round 7): a hand-walked spec
    vector pins the nibble reconstruction and table updates
    independently of the encoder; mono + stereo round-trips stay
    within 4-bit-ADPCM error; the fact chunk trims encoder padding."""
    from melodist_spark.pipeline.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
        decode_wav,
        encode_wav_adpcm,
    )

    # spec table anchors (IMA ADPCM reference tables)
    assert _IMA_STEPS[0] == 7 and _IMA_STEPS[88] == 32767
    assert len(_IMA_STEPS) == 89
    assert _IMA_INDEX.tolist() == [-1, -1, -1, -1, 2, 4, 6, 8]

    # hand-walked vector: pred=0, idx=0 (step 7), nibbles 3,8,15,4:
    #  n=3:  diff = 0+1+3      = 4  -> pred 4;   idx -1 -> 0 (clamp)
    #  n=8:  diff = 0 (sign)        -> pred 4;   idx -1 -> 0
    #  n=15: diff = 0+1+3+7    = 11 -> pred -7;  idx +8 -> 8 (step 16)
    #  n=4:  diff = 2+16       = 18 -> pred 11;  idx +2 -> 10
    raw_block = bytes([0, 0, 0, 0, 0x83, 0x4F, 0x00, 0x00])
    fmt = (
        (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (4000).to_bytes(4, "little")
        + (8).to_bytes(2, "little") + (4).to_bytes(2, "little")
    )

    def chunk(cid, body):
        return (
            cid + len(body).to_bytes(4, "little") + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    payload = (
        b"WAVE" + chunk(b"fmt ", fmt)
        + chunk(b"fact", (5).to_bytes(4, "little"))
        + chunk(b"data", raw_block)
    )
    wav = b"RIFF" + len(payload).to_bytes(4, "little") + payload
    dec, rate = decode_wav(wav)
    assert rate == 8000
    assert (dec[:, 0] * 32768).round().astype(int).tolist() == [0, 4, 4, -7, 11]

    # round-trips: 4-bit differential coding of a loud sine stays
    # within a few percent of full scale, at ~3.9x compression
    t = np.arange(8000) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t)
    enc = encode_wav_adpcm(x, 8000, block_align=256)
    got, r = decode_wav(enc)
    assert r == 8000 and got.shape == (8000, 1)  # fact trims padding
    assert np.abs(got[:, 0] - x).max() < 0.05
    assert len(enc) < len(x) * 2 / 3.5

    y = np.stack([x, 0.3 * np.cos(2 * np.pi * 220 * t)], axis=1)
    got2, _ = decode_wav(encode_wav_adpcm(y, 16000, block_align=512))
    assert got2.shape == (8000, 2)
    assert np.abs(got2 - y).max() < 0.05

    with pytest.raises(ValueError):
        encode_wav_adpcm(x, 8000, block_align=6)  # not 4-aligned
    with pytest.raises(ValueError):
        encode_wav_adpcm(np.zeros((10, 3)), 8000)  # >2 channels


def test_audio_fingerprint_invariant_across_adpcm():
    """The RMS-envelope fingerprint of a signal must survive an IMA-
    ADPCM re-encode nearly unchanged (small Hamming distance) — the
    codec invariance that lets perceptual audio dedup catch 4-bit
    re-encoded duplicates of a PCM original."""
    from melodist_spark.pipeline.multimodal import (
        audio_fingerprint64,
        encode_wav_adpcm,
    )

    t = np.arange(16000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 330 * t) * np.sin(2 * np.pi * 1.5 * t)
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype("<i2")
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = pcm.tobytes()
    wav_pcm = (
        b"RIFF" + (4 + 8 + len(fmt) + 8 + len(body)).to_bytes(4, "little")
        + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(body).to_bytes(4, "little") + body
    )
    wav_adpcm = encode_wav_adpcm(x, 8000, block_align=256)

    fp_pcm = audio_fingerprint64(wav_pcm)
    fp_adpcm = audio_fingerprint64(wav_adpcm)
    assert fp_pcm is not None and fp_adpcm is not None
    dist = bin((fp_pcm ^ fp_adpcm) & ((1 << 64) - 1)).count("1")
    assert dist <= 6, dist  # well under the dedup join's band radius


def test_decode_wav_24_32_and_float():
    """24-bit (3-byte sign-extended), 32-bit int, and IEEE-float
    (format 3) PCM decode against hand-built containers with known
    sample values — incl. full-scale negatives exercising the
    sign-extension path."""
    import struct

    import numpy as np

    from melodist_spark.pipeline.multimodal import decode_wav

    def wav(fmt, bits, payload, channels=1, rate=8000):
        block = channels * bits // 8
        fmt_chunk = struct.pack(
            "<HHIIHH", fmt, channels, rate, rate * block, block, bits
        )
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 24-bit: 0, +1 LSB, full-scale pos, -1 LSB, full-scale neg
    vals24 = [0, 1, 0x7FFFFF, -1, -0x800000]
    p24 = b"".join(v.to_bytes(3, "little", signed=True) for v in vals24)
    s, rate = decode_wav(wav(1, 24, p24))
    assert rate == 8000 and s.shape == (5, 1)
    np.testing.assert_allclose(
        s[:, 0], np.array(vals24) / 8388608.0, atol=0
    )

    # 32-bit int, stereo (interleave check)
    vals32 = [0, 2**31 - 1, -(2**31), 123456789]
    p32 = struct.pack("<4i", *vals32)
    s, _ = decode_wav(wav(1, 32, p32, channels=2))
    assert s.shape == (2, 2)
    np.testing.assert_allclose(
        s.ravel(), np.array(vals32) / 2147483648.0
    )

    # IEEE float32 passes through exactly
    f32 = [0.0, 0.5, -1.0, 0.25]
    s, _ = decode_wav(wav(3, 32, struct.pack("<4f", *f32)))
    np.testing.assert_array_equal(s[:, 0], np.array(f32, dtype=np.float32))

    # float64
    s, _ = decode_wav(wav(3, 64, struct.pack("<2d", 0.125, -0.75)))
    np.testing.assert_array_equal(s[:, 0], [0.125, -0.75])


def _build_tiff(img, compression=1, predictor=1, rows_per_strip=None,
                endian="little", photometric=None):
    """Test-side TIFF writer (independent of the decoder): strip
    layout, PackBits/LZW compressors implemented from the spec text,
    both byte orders."""
    import numpy as np

    e = "<" if endian == "little" else ">"
    bo = endian
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    if photometric is None:
        photometric = 1 if spp == 1 else 2
    px = img.reshape(h, w * spp)
    if predictor == 2:
        d = px.reshape(h, w, spp).astype(np.int64)
        d = np.concatenate([d[:, :1], (d[:, 1:] - d[:, :-1]) % 256], axis=1)
        px = d.astype(np.uint8).reshape(h, w * spp)
    rps = rows_per_strip or h

    def packbits(row: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(row):
            run = 1
            while i + run < len(row) and run < 128 and row[i + run] == row[i]:
                run += 1
            if run >= 2:
                out += bytes([257 - run, row[i]])
                i += run
            else:
                j = i + 1
                while (
                    j < len(row)
                    and j - i < 128
                    and not (j + 1 < len(row) and row[j + 1] == row[j])
                ):
                    j += 1
                out += bytes([j - i - 1]) + row[i:j]
                i = j
        return bytes(out)

    def lzw(data: bytes) -> bytes:
        # spec-text reference: MSB-first, early change, Clear first
        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        bits = []

        def emit(code):
            bits.append(format(code, f"0{width}b"))

        emit(256)
        cur = b""
        for b in data:
            nxt_s = cur + bytes([b])
            if nxt_s in table:
                cur = nxt_s
                continue
            emit(table[cur])
            table[nxt_s] = nxt
            nxt += 1
            if nxt == (1 << width) - 1 and width < 12:
                width += 1
            if nxt == 4094:  # table full: spec says emit Clear, reset
                emit(256)
                table = {bytes([i]): i for i in range(256)}
                nxt, width = 258, 9
            cur = bytes([b])
        if cur:
            emit(table[cur])
        emit(257)
        s = "".join(bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[k : k + 8], 2) for k in range(0, len(s), 8))

    strips = []
    for r0 in range(0, h, rps):
        raw = px[r0 : r0 + rps].tobytes()
        if compression == 32773:
            strips.append(packbits(raw))
        elif compression == 5:
            strips.append(lzw(raw))
        else:
            strips.append(raw)

    import struct

    def entry(tag, typ, vals):
        size = {1: 1, 3: 2, 4: 4}[typ]
        packed = b"".join(v.to_bytes(size, bo) for v in vals)
        if len(packed) <= 4:
            return struct.pack(f"{e}HHI", tag, typ, len(vals)) + packed.ljust(4, b"\x00"), b""
        return None, packed  # caller patches offset

    # layout: header(8) + IFD + value-overflow area + strip data
    tags = [
        (256, 3, [w]),
        (257, 3, [h]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (278, 3, [rps]),
        (317, 3, [predictor]),
    ]
    n_strips = len(strips)
    ifd_off = 8
    ifd_size = 2 + 12 * (len(tags) + 2) + 4
    overflow = bytearray()
    entries = []
    ov_base = ifd_off + ifd_size

    def add(tag, typ, vals):
        size = {1: 1, 3: 2, 4: 4}[typ]
        packed = b"".join(v.to_bytes(size, bo) for v in vals)
        if len(packed) <= 4:
            entries.append(struct.pack(f"{e}HHI", tag, typ, len(vals)) + packed.ljust(4, b"\x00"))
        else:
            off = ov_base + len(overflow)
            entries.append(struct.pack(f"{e}HHII", tag, typ, len(vals), off))
            overflow.extend(packed)

    strip_area = ov_base  # patched after overflow known
    # two passes: first compute overflow from non-strip tags
    for t in tags:
        add(*t)
    # strip offsets/counts go AFTER remaining overflow; reserve
    counts = [len(s) for s in strips]
    # place offsets/counts arrays in overflow too
    data_start = ov_base + len(overflow) + (8 * n_strips if n_strips > 1 else 0)
    offs = []
    pos = data_start
    for c in counts:
        offs.append(pos)
        pos += c
    add(273, 4, offs)
    add(279, 4, counts)
    ifd = struct.pack(f"{e}H", len(entries)) + b"".join(sorted(entries, key=lambda x: int.from_bytes(x[:2], bo))) + struct.pack(f"{e}I", 0)
    assert len(ifd) == ifd_size
    head = (b"II" if bo == "little" else b"MM") + struct.pack(f"{e}HI", 42, ifd_off)
    return head + ifd + bytes(overflow) + b"".join(strips)


def test_decode_tiff_baseline(spark):
    """Baseline TIFF against an independent test-side writer: gray and
    RGB, uncompressed / PackBits / TIFF-LZW (MSB-first, early change),
    multi-strip, horizontal predictor, WhiteIsZero, big-endian."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import decode_tiff

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    rgb = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    flat = np.tile(np.arange(16, dtype=np.uint8), (4, 8))  # runs for packbits/lzw

    for img in (gray, rgb, flat):
        for comp in (1, 32773, 5):
            for pred in (1, 2) if comp == 5 else (1,):
                for rps in (None, 2):
                    t = _build_tiff(img, compression=comp, predictor=pred,
                                    rows_per_strip=rps)
                    np.testing.assert_array_equal(decode_tiff(t), img, err_msg=f"{img.shape} comp={comp} pred={pred} rps={rps}")

    # big-endian
    np.testing.assert_array_equal(
        decode_tiff(_build_tiff(gray, endian="big")), gray
    )
    # WhiteIsZero inverts
    np.testing.assert_array_equal(
        decode_tiff(_build_tiff(gray, photometric=0)), 255 - gray
    )
    # poison: truncated strip raises, never returns garbage
    t = _build_tiff(gray)
    try:
        decode_tiff(t[:-10])
        assert False, "should raise"
    except ValueError:
        pass

    # dispatch: a TIFF payload rides the real image feature path and
    # yields the same thumbprint as the same pixels in PPM form
    from melodist_spark.pipeline.multimodal import (
        encode_ppm,
        numpy_media_decoder,
    )

    np.testing.assert_array_equal(
        numpy_media_decoder(_build_tiff(rgb)),
        numpy_media_decoder(encode_ppm(rgb)),
    )

    # and through the distributed resize path (re-encoded as PPM)
    import pyspark.sql.functions as SF

    from melodist_spark.pipeline.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(_build_tiff(rgb, compression=5)))],
        "media_id long, payload binary",
    )
    out = resize_images(df, 3, 2).collect()[0]
    assert out["err"] is None and (out["height"], out["width"]) == (3, 2)
    assert bytes(out["payload"])[:2] == b"P6"


def test_tiff_lzw_differential():
    """Decoder inverts a spec-text reference compressor on arbitrary
    byte strings (hypothesis), including table-growth past the 9->10
    bit early-change boundary."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from melodist_spark.pipeline.multimodal import _tiff_lzw

    def ref_lzw(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        bits = []

        def emit(code):
            bits.append(format(code, f"0{width}b"))

        emit(256)
        cur = b""
        for b in data:
            s = cur + bytes([b])
            if s in table:
                cur = s
                continue
            emit(table[cur])
            table[s] = nxt
            nxt += 1
            if nxt == (1 << width) - 1 and width < 12:
                width += 1
            if nxt == 4094:  # table full: spec says emit Clear, reset
                emit(256)
                table = {bytes([i]): i for i in range(256)}
                nxt, width = 258, 9
            cur = bytes([b])
        if cur:
            emit(table[cur])
        emit(257)
        s = "".join(bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[k : k + 8], 2) for k in range(0, len(s), 8))

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=2000))
    def case(data):
        assert _tiff_lzw(ref_lzw(data), len(data)) == data

    case()
    # deterministic boundary push: low-entropy long input grows the
    # table well past 511 entries
    big = bytes(np.random.default_rng(3).integers(0, 4, 30000, dtype=np.uint8))
    assert _tiff_lzw(ref_lzw(big), len(big)) == big


def test_decode_tiff_bitflip_fuzz():
    """Bitflipped TIFFs either decode or raise ValueError — never an
    uncontrolled exception class (the poison-blob contract that lets
    the mapInPandas wrappers quarantine instead of die)."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import decode_tiff

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    for comp in (1, 32773, 5):
        base = bytearray(_build_tiff(img, compression=comp))
        for trial in range(300):
            buf = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
            try:
                out = decode_tiff(bytes(buf))
                assert out.dtype == np.uint8
            except ValueError:
                pass


def test_phash_properties_and_neardup(spark):
    """pHash invariances dHash lacks: a 2x resize and a JPEG
    re-encode move few low-frequency bits (small Hamming distance to
    the original), unrelated images are far; the banded LSH join
    finds the resized twin without all-pairs. Orthonormal-DCT energy
    is preserved (Parseval) as a kernel sanity pin."""
    import numpy as np

    from melodist_spark.pipeline.jpeg import encode_jpeg
    from melodist_spark.pipeline.multimodal import (
        dhash_neardup_pairs,
        encode_png,
        image_phash,
        phash64,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.default_rng(5)
    # structured image (smooth gradients + a blob) — pHash is about
    # low-frequency content, so pure noise is the wrong test subject
    y, x = np.mgrid[0:64, 0:64]
    img = (
        96
        + 60 * np.sin(x / 9.0)
        + 40 * np.cos(y / 7.0)
        + 50 * ((x - 20) ** 2 + (y - 40) ** 2 < 150)
    ).clip(0, 255).astype(np.uint8)
    img3 = np.repeat(img[:, :, None], 3, axis=2)

    base = phash64(encode_png(img3))
    # 2x upscale: identical low-frequency structure (measured 0 bits)
    up = np.repeat(np.repeat(img3, 2, axis=0), 2, axis=1)
    assert ham(base, phash64(encode_png(up))) <= 2
    # JPEG q=70 re-encode (measured 6 bits)
    assert ham(base, phash64(encode_jpeg(img3, quality=70))) <= 8
    # unrelated image is far
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert ham(base, phash64(encode_png(other))) >= 16
    # audio/undecodable -> None
    assert phash64(b"RIFFxxxxWAVE") is None
    assert phash64(b"garbage") is None

    # banded near-dup over phash finds the resized twin only
    rows = [
        (1, bytearray(encode_png(img3))),
        (2, bytearray(encode_png(up))),
        (3, bytearray(encode_png(other))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sig = image_phash(df)
    pairs = dhash_neardup_pairs(
        sig.filter(F.col("phash").isNotNull()),
        hash_col="phash",
        max_distance=3,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_video_neardup_via_frame_phash(spark):
    """Video near-dup end to end: a quality-70 re-encode of an MJPEG
    clip pairs with its original through shared frame pHashes (no two
    FILES share a byte), an unrelated clip doesn't, and a single
    coincidentally-similar frame can't pair videos (min_shared)."""
    import numpy as np

    from melodist_spark.pipeline.avi import encode_avi_mjpeg
    from melodist_spark.pipeline.multimodal import (
        video_neardup_pairs,
        video_phash,
    )

    rng = np.random.default_rng(9)
    y, x = np.mgrid[0:48, 0:48]

    def scene(t):
        return (
            (
                110
                + 70 * np.sin(x / 7.0 + t)
                + 50 * np.cos(y / 9.0 - t / 2.0)
            )
            .clip(0, 255)
            .astype(np.uint8)[:, :, None]
            .repeat(3, axis=2)
        )

    clip = [scene(t / 3.0) for t in range(12)]
    noise = [
        rng.integers(0, 256, (48, 48, 3), dtype=np.uint8) for _ in range(12)
    ]
    rows = [
        (1, "video", bytearray(encode_avi_mjpeg(clip, quality=92))),
        (2, "video", bytearray(encode_avi_mjpeg(clip, quality=70))),
        (3, "video", bytearray(encode_avi_mjpeg(noise, quality=92))),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    sig = video_phash(df, every_n=3)  # 4 sampled frames per clip
    assert sig.filter(F.col("phash").isNull()).count() == 0
    pairs = video_neardup_pairs(sig, min_shared=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    # measured hammings 4/4/6/12 at q92 vs q70 — three of the four
    # sampled frames sit within the 6-bit default
    assert pairs[0]["shared_frames"] >= 2


def _gif_partial_anim(frames_spec, canvas_hw) -> bytes:
    """Animated GIF89a with sub-rectangle frames (disposal=1, own
    local palettes) — the real-world shape whose composited canvases
    accumulate MORE than 256 distinct colors, which
    ``encode_gif_frames`` (full-canvas frames only) cannot produce."""
    from melodist_spark.pipeline.multimodal import (
        _gif_lzw_encode,
        _gif_palette,
        _gif_sub_blocks,
    )

    h, w = canvas_hw
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x00, 0, 0])  # no global color table
    for left, top, f in frames_spec:
        pal, idx, bits, min_code = _gif_palette(f)
        out += b"\x21\xf9\x04" + bytes([(1 & 0x07) << 2])  # disposal=1
        out += (5).to_bytes(2, "little") + b"\x00\x00"
        fh, fw = f.shape[:2]
        out += (
            b"\x2c"
            + left.to_bytes(2, "little")
            + top.to_bytes(2, "little")
            + fw.to_bytes(2, "little")
            + fh.to_bytes(2, "little")
        )
        out += bytes([0x80 | (bits - 1)])
        out += pal.tobytes()
        out += bytes([min_code])
        out += _gif_sub_blocks(_gif_lzw_encode(idx, min_code))
    out += b"\x3b"
    return bytes(out)


def _color_rich_clip(gshift: int) -> bytes:
    """36x36 animation whose composites exceed 256 colors from frame 1
    on: a 256-color full base frame plus three 216-new-color overlay
    strips. ``gshift`` perturbs every green channel — a 'different
    quantizer run' of the same scenes, byte-disjoint but pHash-near."""
    import numpy as np

    base = np.zeros((36, 36, 3), dtype=np.uint8)
    ks = (np.arange(36 * 36) % 256).reshape(36, 36)
    base[..., 0] = (ks // 16) * 16
    base[..., 1] = ((ks % 16) * 16 + gshift) % 256
    frames = [(0, 0, base)]
    for i in (1, 2, 3):
        j = np.arange(6 * 36)
        strip = np.zeros((6, 36, 3), dtype=np.uint8)
        strip[..., 0] = ((j % 8) * 4 + 2).reshape(6, 36)
        strip[..., 1] = (i * 60 + gshift) % 256
        strip[..., 2] = (255 - j // 8).reshape(6, 36)
        frames.append((0, 6 * i, strip))
    return _gif_partial_anim(frames, (36, 36))


def test_video_phash_recalls_color_rich_gif_reencode(spark):
    """VERDICT r8 item 1a: composited GIF canvases over 256 colors
    come out of sample_frames as codec='png'; video_phash must keep
    them (the old jpeg/gif-only filter silently dropped every frame
    after the first, so color-rich animations vanished from near-dup
    signatures). Planted recall: a re-quantized copy of a color-rich
    animation pairs with its original THROUGH the png frames."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
        video_neardup_pairs,
        video_phash,
    )

    rng = np.random.default_rng(17)
    noise = [
        rng.integers(0, 5, size=(36, 36, 3), dtype=np.uint8) * 50
        for _ in range(4)
    ]
    from melodist_spark.pipeline.multimodal import encode_gif_frames

    rows = [
        (1, "video", _color_rich_clip(0), None, None, None),
        (2, "video", _color_rich_clip(3), None, None, None),
        (3, "video", encode_gif_frames(noise), None, None, None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    # premise: the composited frames really are the png path
    sampled = sample_frames(df, every_n=1).filter("media_id = 1").toPandas()
    assert sampled["err"].isna().all()
    assert (sampled["codec"] == "png").sum() == 3  # frames 1..3
    assert (sampled["codec"] == "gif").sum() == 1  # base frame

    sig = video_phash(df, every_n=1)
    # the fix: png frames carry phashes instead of vanishing
    per_clip = {
        r["media_id"]: r["n"]
        for r in sig.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_clip[1] == 4 and per_clip[2] == 4
    pairs = video_neardup_pairs(sig, min_shared=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["shared_frames"] >= 3  # the three png composites


def test_frame_dimensions_tolerates_fill_bytes():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker —
    frame_dimensions must walk past them instead of misparsing the
    segment length (ADVICE r7)."""
    import struct

    from melodist_spark.pipeline.avi import frame_dimensions

    sof = b"\xff\xff\xff\xc0" + struct.pack(">HBHHB", 11, 8, 24, 32, 1) + b"\x01\x11\x00"
    jpg = b"\xff\xd8" + b"\xff\xff" + b"\xff\xfe" + struct.pack(">H", 4) + b"ok" + sof
    assert frame_dimensions(jpg) == (24, 32)


def test_sun_times_memo_is_lru_not_fifo(spark):
    """ADVICE r7: a cache hit must refresh recency, so a hot geometry
    inserted FIRST but touched between every cold insertion survives
    300 distinct geometries; under the old FIFO eviction it would be
    the first entry dropped at capacity."""
    from melodist_spark.functions import solar

    solar._SUN_TIMES_MEMO.clear()
    hot_exprs = solar.sun_times_exprs("date", 11.0, 47.0, 1.0)
    for i in range(300):
        # touch the hot geometry, then insert a cold one
        again = solar.sun_times_exprs("date", 11.0, 47.0, 1.0)
        assert again is hot_exprs  # still cached (never rebuilt)
        solar.sun_times_exprs("date", float(i), 0.0, 0.0)
    assert len(solar._SUN_TIMES_MEMO) <= 256
    solar._SUN_TIMES_MEMO.clear()


def test_video_neardup_temporal_alignment(spark):
    """Round 8 (VERDICT item 7): order-awareness. A TRIMMED copy
    (same frames, indices shifted by a constant) keeps one dominant
    offset — aligned_frames == shared_frames and `offset` localizes
    the trim; a SHUFFLED bag of the same frames shares just as many
    frames but its offsets scatter, so min_aligned demotes it while
    the trimmed copy survives. min_aligned=0 preserves the round-7
    unordered contract."""
    import numpy as np

    from melodist_spark.pipeline.multimodal import video_neardup_pairs

    rng = np.random.default_rng(17)
    hashes = [int(h) >> 2 for h in rng.integers(0, 2**63, size=10, dtype=np.int64)]
    rows = []
    # video 1: the original, frames 0..9
    rows += [(1, i, hashes[i]) for i in range(10)]
    # video 2: trimmed copy — first 3 frames cut, indices restart at 0
    rows += [(2, i, hashes[i + 3]) for i in range(7)]
    # video 3: shuffled bag of the same frames (no temporal structure)
    perm = [7, 0, 9, 2, 5, 8, 1, 4, 6, 3]
    rows += [(3, i, hashes[perm[i]]) for i in range(10)]
    sig = spark.createDataFrame(
        rows, "media_id long, frame_idx long, phash long"
    )

    loose = {
        (r["id_a"], r["id_b"]): r
        for r in video_neardup_pairs(sig, min_shared=2).collect()
    }
    # unordered contract: all three pairings share plenty of frames
    assert set(loose) == {(1, 2), (1, 3), (2, 3)}
    assert loose[(1, 2)]["shared_frames"] == 7
    assert loose[(1, 2)]["aligned_frames"] == 7  # one dominant offset
    assert loose[(1, 2)]["offset"] == -3  # localizes the trim
    assert loose[(1, 3)]["shared_frames"] == 10
    assert loose[(1, 3)]["aligned_frames"] <= 2  # scattered

    strict = {
        (r["id_a"], r["id_b"]): r
        for r in video_neardup_pairs(sig, min_shared=2, min_aligned=4).collect()
    }
    assert set(strict) == {(1, 2)}  # trimmed copy recalled, bag demoted


def test_video_neardup_out_of_domain_ids_excluded(spark):
    """Ids outside [0, 2^43) would be mangled by the media_id*2^20 +
    frame_idx packing (a negative composite under shiftrightunsigned
    becomes a huge positive "video id", breaking the id_a < id_b
    contract) — the ingest filter must EXCLUDE them like null hashes,
    never emit garbage ids."""
    from melodist_spark.pipeline.multimodal import video_neardup_pairs

    h = 0x5A5A5A5A
    rows = (
        [(7, i, h + 0) for i in range(4)]
        + [(9, i, h + 0) for i in range(4)]      # true dup of 7
        + [(-5, i, h + 0) for i in range(4)]     # negative id: excluded
        + [(1 << 43, i, h + 0) for i in range(4)]  # too wide: excluded
    )
    sig = spark.createDataFrame(
        rows, "media_id long, frame_idx long, phash long"
    )
    pairs = video_neardup_pairs(sig, min_shared=2).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ids == {(7, 9)}
    for r in pairs:
        assert 0 <= r["id_a"] < r["id_b"] < (1 << 43)


def test_streaming_repetition_gate_matches_batch(spark, tmp_path):
    """The Gopher repetition gate (Arrow kernel, stateless) inside
    streaming_curate drops exactly the documents batch
    repetition_flags drops on the same cleaned text."""
    import numpy as np

    from melodist_spark.pipeline.text import (
        GOPHER_REPETITION_THRESHOLDS,
        clean_text,
        fix_text,
        quality_flags,
        repetition_flags,
    )
    from melodist_spark.streaming.ingest import streaming_curate

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(40):
        toks = list(rng.choice(vocab, size=40))
        if i % 4 == 0:
            # heavy within-doc repetition: one 8-token phrase 4x ->
            # trips the dup-5..10-gram coverage thresholds
            toks = toks[:8] * 4 + toks[8:19]
        # stopwords appended AFTER the repetition transform so every
        # doc passes the quality stopword gate (>= 5%)
        toks += ["the", "a", "is", "the"]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    src = str(tmp_path / "rep_gate_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_curate(
            stream,
            None,
            min_tokens=20,
            repetition_thresholds=GOPHER_REPETITION_THRESHOLDS,
        )
        .writeStream.format("memory")
        .queryName("rep_gated")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM rep_gated").collect()
    }

    cleaned = docs.withColumn(
        "text_clean", clean_text(fix_text(F.col("text")))
    )
    gated = quality_flags(
        cleaned, text_col="text_clean", min_tokens=20
    ).filter("keep")
    want = {
        r["doc_id"]
        for r in repetition_flags(gated, text_col="text_clean")
        .filter("keep")
        .collect()
    }
    assert got == want
    # the gate fired: the planted repetitious docs are gone
    assert got and all(i not in got for i in range(0, 40, 4))

    import pytest

    with pytest.raises(ValueError, match="unknown repetition signals"):
        streaming_curate(
            stream, None, repetition_thresholds={"nope": 0.5}
        )


def test_streaming_embedding_increment_foreach_batch(spark, tmp_path):
    """The embedding increment's documented streaming shape: a
    readStream of embedding batches, `foreachBatch` running
    `embedding_neardup_against` against the durable index and
    advancing it with the survivors' `embedding_index`. Two
    micro-batches pin the cross-batch semantics — batch 2's twins of
    batch 1's NOVEL vectors are dropped only because batch 1
    advanced the index — and the surviving id set matches the
    sequential batch-mode loop exactly."""
    from melodist_spark.pipeline.similarity import (
        embedding_index,
        embedding_neardup_against,
    )

    dim, planes, tables = 8, 6, 2
    rng = np.random.default_rng(23)
    base = [rng.normal(size=dim) for _ in range(30)]

    def frame(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )

    corpus = frame([(i, [float(x) for x in v]) for i, v in enumerate(base)])
    novel1 = [rng.normal(size=dim) for _ in range(5)]
    b1 = [  # twins of the seed corpus (dropped) + novel (kept)
        (100 + j, [float(x) for x in base[j] + rng.normal(size=dim) * 1e-3])
        for j in range(5)
    ] + [(110 + j, [float(x) for x in novel1[j]]) for j in range(5)]
    b2 = [  # twins of batch 1's novels — dropped ONLY via the advance
        (200 + j, [float(x) for x in novel1[j] + rng.normal(size=dim) * 1e-3])
        for j in range(5)
    ] + [(210, [float(x) for x in rng.normal(size=dim)])]

    # batch-mode reference loop
    kw = dict(dim=dim, threshold=0.999, num_planes=planes,
              num_tables=tables)
    idx = embedding_index(corpus, dim, planes, tables)
    expect = []
    for rows in (b1, b2):
        surv = embedding_neardup_against(frame(rows), idx, **kw)
        expect.extend(r["vec_id"] for r in surv.collect())
        idx = idx.unionByName(embedding_index(surv, dim, planes, tables))
    assert sorted(expect) == [110, 111, 112, 113, 114, 210]

    # streaming: one parquet file per micro-batch, index and results
    # as durable parquet state the foreachBatch closure advances
    src = str(tmp_path / "emb_stream")
    for name, rows in (("b0", b1), ("b1", b2)):
        frame(rows).coalesce(1).write.parquet(f"{src}/{name}")
    index_path = str(tmp_path / "emb_index")
    out_path = str(tmp_path / "emb_out")
    embedding_index(corpus, dim, planes, tables).write.parquet(index_path)

    def step(batch_df, _bid):
        cur = batch_df.sparkSession.read.parquet(index_path)
        surv = embedding_neardup_against(batch_df, cur, **kw)
        embedding_index(surv, dim, planes, tables).write.mode(
            "append"
        ).parquet(index_path)
        surv.select("vec_id").write.mode("append").parquet(out_path)

    stream = (
        spark.readStream.schema(frame(b1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        r["vec_id"] for r in spark.read.parquet(out_path).collect()
    )
    assert got == sorted(expect)


def test_streaming_span_increment_foreach_batch(spark, tmp_path):
    """The repeated-span increment's documented streaming shape
    (round 11 — the ExactSubstr analogue of the embedding-increment
    stream above): a readStream of document batches, `foreachBatch`
    running `remove_repeated_spans_against` against the durable
    gram-count state and appending the SURVIVORS' `gram_index` delta
    (merge-on-read: the reader re-aggregates the append log, which
    is `merge_gram_index` applied lazily). Cross-batch semantics
    pinned: batch 2's copy of a passage first seen in batch 1 is
    excised only because batch 1 advanced the state, while a
    batch-internal duplicate keeps its minimal occurrence; cleaned
    texts match the sequential batch-mode loop exactly."""
    from pyspark.sql import functions as F

    from melodist_spark.pipeline.dedup import (
        gram_index,
        remove_repeated_spans_against,
    )

    P = " ".join(f"p{i}" for i in range(10))
    Q = " ".join(f"q{i}" for i in range(10))
    b1 = [(0, f"one {P} alpha beta"), (1, "x y z w v u t s")]
    b2 = [
        (10, f"two {P} gamma delta"),       # history-held: excised
        (11, f"lead {Q} mid"),              # batch-internal keeper
        (12, f"{Q} tail here now"),         # batch-internal copy: cut
    ]

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    kw = dict(span_tokens=5)

    # batch-mode reference loop (state advanced eagerly per batch)
    idx = gram_index(frame(b1).limit(0), **kw)
    expect: dict[int, str] = {}
    for rows in (b1, b2):
        surv = remove_repeated_spans_against(frame(rows), idx, **kw)
        for r in surv.collect():
            expect[r["doc_id"]] = r["text"]
        idx = idx.unionByName(
            gram_index(surv.select("doc_id", "text"), **kw)
        ).groupBy("gh").agg(F.sum("c").alias("c"))
    assert expect[10] == "two gamma delta"
    assert expect[11] == f"lead {Q} mid"
    assert expect[12] == "tail here now"

    src = str(tmp_path / "doc_stream")
    for name, rows in (("b0", b1), ("b1", b2)):
        frame(rows).coalesce(1).write.parquet(f"{src}/{name}")
    state_path = str(tmp_path / "gram_state")
    out_path = str(tmp_path / "span_out")
    # bootstrap under its own batch slot too: every file lives in a
    # delta_batch=N directory, so the parent read discovers one
    # consistent partitioned layout
    gram_index(frame(b1).limit(0), **kw).write.parquet(
        f"{state_path}/delta_batch=-1"
    )

    def step(batch_df, bid):
        s = batch_df.sparkSession
        # snapshot-by-batch-id: a replayed batch must read the state
        # AS OF the batches before it — its own (possibly partially
        # committed) delta is excluded, so the read-modify-write is
        # deterministic under re-execution
        cur = (
            s.read.parquet(state_path)
            .filter(F.col("delta_batch") < bid)
            .groupBy("gh")
            .agg(F.sum("c").alias("c"))
        )
        surv = remove_repeated_spans_against(batch_df, cur, **kw)
        # REPLAY-IDEMPOTENT state advance: foreachBatch re-runs a
        # batch id after failure, and a blind append would re-add the
        # same delta — for SUMMED gram counts that inflates totals
        # past min_occurrences and excises text that was never
        # duplicated (the one index where replay corrupts decisions,
        # not just wastes space). Writing each delta under its batch
        # id with overwrite makes the replay rewrite the same rows.
        gram_index(surv.select("doc_id", "text"), **kw).write.mode(
            "overwrite"
        ).parquet(f"{state_path}/delta_batch={bid}")
        surv.select("doc_id", "text").write.mode("overwrite").parquet(
            f"{out_path}/delta_batch={bid}"
        )

    stream = (
        spark.readStream.schema(frame(b1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def snapshot():
        texts = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(out_path).collect()
        }
        counts = {
            (r["gh"], r["c"])
            for r in spark.read.parquet(state_path)
            .groupBy("gh")
            .agg(F.sum("c").alias("c"))
            .collect()
        }
        return texts, counts

    got, state0 = snapshot()
    assert got == expect

    # REPLAY: re-run the last batch with its original batch id (what
    # a post-failure restart does). The batch-id snapshot read plus
    # the overwrite-by-batch-id writes must leave output and state
    # byte-identical — a blind append would have double-counted the
    # delta and excised text that was never duplicated.
    step(frame(b2), 1)
    got2, state1 = snapshot()
    assert got2 == expect
    assert state1 == state0


def test_span_increment_sink_crash_between_writes(spark, tmp_path):
    """The replay-safe sink (round 13, VERDICT r12 item 5): batch 1
    crashes AFTER its output delta is durable but BEFORE its state
    delta lands (the write-order window). The restart replays batch 1
    with the real sink; because reads are snapshotted at
    delta_batch < bid and writes are batch-id-keyed overwrites, the
    replay must converge output AND state to the uninterrupted run's
    exact content — and a second replay must be a byte-level no-op."""
    import pytest
    from pyspark.sql import functions as F

    from melodist_spark.streaming.increments import SpanIncrementSink

    P = " ".join(f"p{i}" for i in range(10))
    Q = " ".join(f"q{i}" for i in range(10))
    b1 = [(0, f"one {P} alpha beta"), (1, "x y z w v u t s")]
    b2 = [
        (10, f"two {P} gamma delta"),  # history-held: excised
        (11, f"lead {Q} mid"),         # batch-internal keeper
        (12, f"{Q} tail here now"),    # batch-internal copy: cut
    ]

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    kw = dict(span_tokens=5)

    def snapshot(sink):
        texts = {
            r["doc_id"]: r["text"]
            for r in sink.output(spark).collect()
        }
        state = {
            (r["gh"], r["c"])
            for r in sink.state_as_of(spark).collect()
        }
        return texts, state

    # uninterrupted reference run
    ref = SpanIncrementSink(
        str(tmp_path / "ref_state"), str(tmp_path / "ref_out"), **kw
    )
    ref.init(frame(b1).limit(0))
    ref(frame(b1), 0)
    ref(frame(b2), 1)
    want_texts, want_state = snapshot(ref)
    assert want_texts[10] == "two gamma delta"
    assert want_texts[11] == f"lead {Q} mid"
    assert want_texts[12] == "tail here now"

    class CrashBetweenWrites(SpanIncrementSink):
        def _write_state(self, surv, bid):
            if bid == 1:
                raise RuntimeError("injected crash between writes")
            super()._write_state(surv, bid)

    state_path = str(tmp_path / "state")
    out_path = str(tmp_path / "out")
    crash = CrashBetweenWrites(state_path, out_path, **kw)
    crash.init(frame(b1).limit(0))
    crash(frame(b1), 0)
    with pytest.raises(RuntimeError, match="injected crash"):
        crash(frame(b2), 1)
    # the crash window is real: output delta durable, state delta absent
    assert (tmp_path / "out" / "delta_batch=1").exists()
    assert not (tmp_path / "state" / "delta_batch=1").exists()

    # restart: foreachBatch replays bid=1 (checkpoint never committed)
    sink = SpanIncrementSink(state_path, out_path, **kw)
    sink(frame(b2), 1)
    assert snapshot(sink) == (want_texts, want_state)
    # replaying AGAIN (crash after both writes, before the stream
    # checkpoint commit) is also a no-op
    sink(frame(b2), 1)
    assert snapshot(sink) == (want_texts, want_state)


def test_embedding_increment_sink_replay_does_not_self_match(
    spark, tmp_path
):
    """The embedding sink's snapshot read (delta_batch < bid) is what
    keeps a REPLAYED batch from matching its own already-written state
    delta — without it every survivor would read as a duplicate of
    itself and silently vanish. Crash after BOTH writes (before the
    stream checkpoint commit): the replay must keep the same survivors
    and leave state identical; and the between-writes window must
    converge too."""
    import pytest

    from melodist_spark.streaming.increments import EmbeddingIncrementSink

    dim = 4

    def frame(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    seed = [(1, [1, 0, 0, 0]), (2, [0, 1, 0, 0])]
    b1 = [(110, [1, 0, 0, 0]), (111, [0, 0, 1, 0])]   # 110 dup of 1
    b2 = [(210, [0, 0, 1, 0]), (211, [0, 0, 0, 1])]   # 210 dup of 111

    kw = dict(dim=dim, threshold=0.999, num_planes=4, num_tables=1)
    sink = EmbeddingIncrementSink(
        str(tmp_path / "e_state"), str(tmp_path / "e_out"), **kw
    )
    sink.init(frame(seed))
    sink(frame(b1), 0)
    sink(frame(b2), 1)

    def snapshot():
        out = sorted(
            r["vec_id"] for r in sink.output(spark).collect()
        )
        state = sorted(
            r["vec_id"] for r in sink.state_as_of(spark).collect()
        )
        return out, state

    want = snapshot()
    assert want[0] == [111, 211]  # 110/210 deduplicated cross-batch

    # replay with batch 1's state delta ALREADY durable: the snapshot
    # read must exclude it — survivors unchanged, no self-match loss
    sink(frame(b2), 1)
    assert snapshot() == want

    # the between-writes window converges as well
    class CrashBetweenWrites(EmbeddingIncrementSink):
        def _write_state(self, surv, bid):
            if bid == 1:
                raise RuntimeError("injected crash between writes")
            super()._write_state(surv, bid)

    crash = CrashBetweenWrites(
        str(tmp_path / "c_state"), str(tmp_path / "c_out"), **kw
    )
    crash.init(frame(seed))
    crash(frame(b1), 0)
    with pytest.raises(RuntimeError, match="injected crash"):
        crash(frame(b2), 1)
    sink2 = EmbeddingIncrementSink(
        str(tmp_path / "c_state"), str(tmp_path / "c_out"), **kw
    )
    sink2(frame(b2), 1)
    assert sorted(
        r["vec_id"] for r in sink2.output(spark).collect()
    ) == [111, 211]


def test_minhash_increment_sink_matches_batch_loop(spark, tmp_path):
    """MinHash sink parity with the sequential batch-mode loop
    (neardup_against + minhash_index state advance), plus replay
    idempotence of the last batch."""
    from melodist_spark.pipeline.dedup import minhash_index, neardup_against
    from melodist_spark.streaming.increments import MinhashIncrementSink

    text_a = " ".join(f"w{i}" for i in range(12))
    text_b = " ".join(f"u{i}" for i in range(12))
    text_c = " ".join(f"v{i}" for i in range(12))
    b1 = [(0, text_a), (1, text_b)]
    b2 = [(10, text_a), (11, text_c)]  # 10 dup of 0 via state

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    kw = dict(num_hashes=16, band_size=4, threshold=0.8)

    # batch-mode reference loop
    idx = minhash_index(frame(b1).limit(0), **{k: kw[k] for k in ["num_hashes"]})
    expect = []
    for rows in (b1, b2):
        surv = neardup_against(frame(rows), idx, **kw)
        expect.extend(r["doc_id"] for r in surv.collect())
        idx = idx.unionByName(minhash_index(surv, num_hashes=16))
    assert sorted(expect) == [0, 1, 11]

    sink = MinhashIncrementSink(
        str(tmp_path / "m_state"), str(tmp_path / "m_out"), **kw
    )
    sink.init(frame(b1).limit(0))
    sink(frame(b1), 0)
    sink(frame(b2), 1)
    got = sorted(r["doc_id"] for r in sink.output(spark).collect())
    assert got == sorted(expect)
    state0 = sorted(
        tuple(r) for r in sink.state_as_of(spark).collect()
    )
    sink(frame(b2), 1)  # replay: byte-identical state and output
    assert sorted(
        r["doc_id"] for r in sink.output(spark).collect()
    ) == sorted(expect)
    assert sorted(
        tuple(r) for r in sink.state_as_of(spark).collect()
    ) == state0


def test_increment_sinks_drop_intra_batch_near_dups(spark, tmp_path):
    """Round-13 review finding: the against-ops compare batch-vs-index
    only, so two near-copies arriving in the SAME micro-batch both
    survived and both entered the durable index forever. The sinks'
    intra_batch pass (default on) must keep only the min-id
    representative of a within-batch near-dup cluster — in the
    output, and in the state delta."""
    from melodist_spark.streaming.increments import (
        EmbeddingIncrementSink,
        MinhashIncrementSink,
    )

    # minhash: doc 21 is a copy of doc 20 inside one batch
    text_a = " ".join(f"w{i}" for i in range(12))
    text_b = " ".join(f"u{i}" for i in range(12))
    batch = [(20, text_a), (21, text_a), (22, text_b)]
    m = MinhashIncrementSink(
        str(tmp_path / "m_state"), str(tmp_path / "m_out"),
        num_hashes=16, band_size=4, threshold=0.8,
    )
    m.init(spark.createDataFrame([], "doc_id long, text string").limit(0))
    m(spark.createDataFrame(batch, "doc_id long, text string"), 0)
    out = sorted(r["doc_id"] for r in m.output(spark).collect())
    assert out == [20, 22]  # 21 dropped inside its own batch
    state_ids = sorted(
        r["doc_id"] for r in m.state_as_of(spark).collect()
    )
    assert state_ids == [20, 22]  # the copy never entered the index

    # embedding: vec 31 is a copy of vec 30 inside one batch
    def frame(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    e = EmbeddingIncrementSink(
        str(tmp_path / "e_state"), str(tmp_path / "e_out"),
        dim=4, threshold=0.999, num_planes=4, num_tables=2,
    )
    e.init(frame([(1, [0, 1, 0, 0])]))
    e(frame([(30, [1, 0, 0, 0]), (31, [1, 0, 0, 0]), (32, [0, 0, 1, 0])]), 0)
    out = sorted(r["vec_id"] for r in e.output(spark).collect())
    assert out == [30, 32]
    state_ids = sorted(
        r["vec_id"] for r in e.state_as_of(spark).collect()
    )
    assert state_ids == [1, 30, 32]

    # a second batch re-sending the kept doc is still dropped via the
    # advanced state (the against-pass still works after the self-pass)
    m(spark.createDataFrame([(40, text_a)], "doc_id long, text string"), 1)
    assert sorted(r["doc_id"] for r in m.output(spark).collect()) == [20, 22]


def test_increment_sink_compact_folds_state_log(spark, tmp_path):
    """compact() folds every slot below the horizon into the base
    slot: identical state_as_of rows, fewer directories, the newest
    slot untouched (it is the only one Structured Streaming can still
    replay), and the against-pass keeps working afterwards."""
    import os

    from melodist_spark.streaming.increments import MinhashIncrementSink

    text_a = " ".join(f"w{i}" for i in range(12))
    text_b = " ".join(f"u{i}" for i in range(12))
    text_c = " ".join(f"v{i}" for i in range(12))

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    sink = MinhashIncrementSink(
        str(tmp_path / "state"), str(tmp_path / "out"),
        num_hashes=16, band_size=4, threshold=0.8,
    )
    sink.init(frame([(99, text_c)]).limit(0))
    sink(frame([(0, text_a)]), 0)
    sink(frame([(1, text_b)]), 1)
    sink(frame([(2, text_c)]), 2)
    before = sorted(tuple(r) for r in sink.state_as_of(spark).collect())

    sink.compact(spark)  # default horizon: all but the newest slot

    slots = sorted(
        d for d in os.listdir(tmp_path / "state")
        if d.startswith("delta_batch=")
    )
    assert slots == ["delta_batch=-1", "delta_batch=2"]
    assert not os.path.exists(tmp_path / "state" / ".compact_staging")
    assert not os.path.exists(tmp_path / "state" / ".compact_manifest")
    assert sorted(
        tuple(r) for r in sink.state_as_of(spark).collect()
    ) == before
    # the compacted index still catches a duplicate of a batch-0 doc
    sink(frame([(10, text_a), (11, " ".join(f"z{i}" for i in range(12)))]), 3)
    assert sorted(r["doc_id"] for r in sink.output(spark).collect()) == [
        0, 1, 2, 11,
    ]
    # replay of the pre-compaction newest batch still excludes its own
    # (now still separate) slot — rule 1 survives the fold
    sink(frame([(2, text_c)]), 2)
    assert sorted(r["doc_id"] for r in sink.output(spark).collect()) == [
        0, 1, 2, 11,
    ]


def test_span_sink_compact_reaggregates_summed_counts(spark, tmp_path):
    """The span sink's gram counts are SUMMED on read — compaction
    must re-aggregate (with max_count saturation), not just union
    rows: total counts and downstream excision decisions identical to
    the uncompacted control."""
    from melodist_spark.streaming.increments import SpanIncrementSink

    quote = " ".join(f"q{i}" for i in range(6))

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    batches = [
        [(0, f"alpha start {quote} tail0")],
        [(1, f"beta mid {quote} tail1")],
        [(2, f"gamma end {quote} tail2")],
    ]
    kw = dict(span_tokens=4, min_occurrences=3, max_count=3)
    a = SpanIncrementSink(str(tmp_path / "a_state"), str(tmp_path / "a_out"), **kw)
    b = SpanIncrementSink(str(tmp_path / "b_state"), str(tmp_path / "b_out"), **kw)
    for s in (a, b):
        s.init(frame(batches[0]).limit(0))
    for i, rows in enumerate(batches):
        a(frame(rows), i)
        b(frame(rows), i)
        if i == 1:
            b.compact(spark)  # fold mid-stream, between batches
    assert sorted(tuple(r) for r in b.state_as_of(spark).collect()) == sorted(
        tuple(r) for r in a.state_as_of(spark).collect()
    )
    assert sorted(
        (r["doc_id"], r["text"]) for r in b.output(spark).collect()
    ) == sorted((r["doc_id"], r["text"]) for r in a.output(spark).collect())
    # batch 2's repeated quote crossed min_occurrences via the
    # compacted counts: its text was excised
    row2 = [r for r in b.output(spark).collect() if r["doc_id"] == 2]
    assert row2 and quote not in row2[0]["text"]


def test_sink_compact_crash_windows_converge(spark, tmp_path):
    """Crash-safety of the swap: (a) a crash AFTER staging+manifest
    but BEFORE any delete leaves the log fully intact (hidden dirs
    are invisible to state reads); (b) a crash MID-DELETE leaves an
    under-claiming log; in both cases the next compact() completes
    the pending swap and the state equals the clean-compaction
    state."""
    from melodist_spark.streaming import increments as inc
    from melodist_spark.streaming.increments import MinhashIncrementSink

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    texts = [" ".join(f"t{b}_{i}" for i in range(12)) for b in range(3)]

    def build(name):
        s = MinhashIncrementSink(
            str(tmp_path / f"{name}_state"), str(tmp_path / f"{name}_out"),
            num_hashes=16, band_size=4, threshold=0.8,
        )
        s.init(frame([(0, texts[0])]).limit(0))
        for i, t in enumerate(texts):
            s(frame([(i, t)]), i)
        return s

    clean = build("clean")
    clean.compact(spark)
    want = sorted(tuple(r) for r in clean.state_as_of(spark).collect())

    # (a) crash before any delete: _compact_finish dies immediately
    s1 = build("predelete")
    orig_finish = inc._BatchIncrementSink._compact_finish
    try:
        inc._BatchIncrementSink._compact_finish = (
            lambda self, spark, slots: (_ for _ in ()).throw(
                RuntimeError("crash")
            )
        )
        try:
            s1.compact(spark)
        except RuntimeError:
            pass
    finally:
        inc._BatchIncrementSink._compact_finish = orig_finish
    # log untouched: staging+manifest are hidden from reads
    assert sorted(
        tuple(r) for r in s1.state_as_of(spark).collect()
    ) == want
    s1.compact(spark)  # recovery completes the armed swap
    assert sorted(tuple(r) for r in s1.state_as_of(spark).collect()) == want

    # (b) crash mid-delete: first slot deleted, then die on rename
    s2 = build("middelete")
    orig_rename = inc._fs_rename
    try:
        inc._fs_rename = lambda spark, src, dst: (_ for _ in ()).throw(
            RuntimeError("crash")
        )
        try:
            s2.compact(spark)
        except RuntimeError:
            pass
    finally:
        inc._fs_rename = orig_rename
    s2.compact(spark)
    assert sorted(tuple(r) for r in s2.state_as_of(spark).collect()) == want


def test_sink_compact_noop_edges(spark, tmp_path):
    """compact() is a safe no-op on a sink with no state dir yet, a
    just-bootstrapped log (base slot only), and an already-compacted
    log (base + newest only) — and idempotent back-to-back."""
    from melodist_spark.streaming.increments import MinhashIncrementSink

    def frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    sink = MinhashIncrementSink(
        str(tmp_path / "state"), str(tmp_path / "out"),
        num_hashes=16, band_size=4, threshold=0.8,
    )
    sink.compact(spark)  # no state dir at all
    sink.init(frame([(0, "x")]).limit(0))
    sink.compact(spark)  # base slot only
    t = " ".join(f"w{i}" for i in range(12))
    sink(frame([(0, t)]), 0)
    sink.compact(spark)  # base + newest: nothing below the horizon
    sink(frame([(1, " ".join(f"u{i}" for i in range(12)))]), 1)
    sink.compact(spark)
    before = sorted(tuple(r) for r in sink.state_as_of(spark).collect())
    sink.compact(spark)  # idempotent
    assert sorted(
        tuple(r) for r in sink.state_as_of(spark).collect()
    ) == before
    assert sorted(r["doc_id"] for r in sink.output(spark).collect()) == [0, 1]
