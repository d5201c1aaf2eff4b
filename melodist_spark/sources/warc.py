"""WARC (Web ARChive, ISO 28500) reader — Common Crawl's format.

A training-data pipeline's raw input is usually WARC: the crawl
archives that feed C4/RefinedWeb-style curation. This reader turns a
directory of ``.warc`` / ``.warc.gz`` files into a DataFrame of
records ready for the curation operators in ``pipeline/``
(clean → quality → dedup → …).

Scale shape: WARC files are the natural unit of parallelism — the
format is a concatenation of independent records, but gzipped
archives are only member-splittable with an index, so (like every
production crawl pipeline) we parallelize per FILE: a
``binaryFile`` scan hands each archive to one task. Memory honesty
at Common Crawl scale (~1 GB gz ≈ 4 GB raw): the COMPRESSED bytes
are materialized once per task (that is what ``binaryFile``
delivers — an inherent cost of the source, ~1 GB), but the
DECOMPRESSED stream never is: records are parsed incrementally off
a ``gzip.GzipFile`` (at most one record's payload in memory at a
time) and flushed out as Arrow batches every ``flush_records``
rows / ``flush_bytes`` payload bytes, so peak per-task memory is
compressed-archive + one flush chunk + one record — not a multiple
of the raw archive. Common Crawl ships ~1 GB archives × tens of
thousands per dump: ample parallelism with no split logic.
Oversized single payloads are dropped loudly (``max_payload``)
instead of OOMing a task — the poison-blob discipline.

Spec notes: WARC/1.0 + 1.1 version lines, named-field headers with
Content-Length payload framing, CRLF record separators; ``.gz``
archives are multi-member gzip (stdlib ``gzip`` handles
concatenated members). For ``response`` records carrying
``application/http``, the HTTP status line + headers are split from
the body so ``http_body`` is the raw page bytes the text pipeline
wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", LongType()),
        StructField("http_content_type", StringType()),
        StructField("http_body", BinaryType()),
        StructField("payload", BinaryType()),
    ]
)


def parse_warc_stream(fh, max_payload: int | None = None):
    """Yield dicts of parsed records incrementally from a binary
    file-like object (plain or a ``gzip.GzipFile``). At most one
    record's payload is resident at a time — this is what lets a
    1 GB-compressed archive parse without materializing the ~4 GB
    decompressed blob. When ``max_payload`` is set, a record whose
    declared Content-Length exceeds it is skipped by reading the
    body in bounded chunks (never allocated whole — a gzip-bomb
    member with a huge Content-Length cannot OOM the worker) and
    yielded with ``payload=None``. Pure function — shared by the
    Spark reader, :func:`parse_warc_records`, and tests."""
    while True:
        # skip inter-record CRLF separators, find the version line
        line = fh.readline()
        if not line:
            return
        version = line.strip()
        if not version:
            continue
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {version[:20]!r}")
        headers = {}
        while True:
            line = fh.readline()
            if not line:
                raise ValueError("truncated WARC header")
            line = line.rstrip(b"\r\n")
            if not line:
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError as e:
            raise ValueError("bad WARC Content-Length") from e
        if max_payload is not None and clen > max_payload:
            # discard the oversized body in bounded chunks: the cap
            # is checked BEFORE any allocation of clen bytes
            left = clen
            while left > 0:
                got = fh.read(min(left, 1 << 20))
                if not got:
                    raise ValueError("WARC payload exceeds file size")
                left -= len(got)
            payload = None
        else:
            payload = fh.read(clen)
            if len(payload) < clen:
                raise ValueError("WARC payload exceeds file size")
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": payload,
        }


def parse_warc_records(blob: bytes):
    """Yield dicts of parsed records from one (decompressed) WARC
    blob — bytes-input convenience over :func:`parse_warc_stream`."""
    import io

    yield from parse_warc_stream(io.BytesIO(blob))


def split_http_payload(payload: bytes):
    """(status, content_type, body) from an ``application/http``
    payload; (None, None, payload) when it isn't HTTP-framed."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    seplen = 4
    if sep < 0:
        sep = payload.find(b"\n\n")
        seplen = 2
    if sep < 0:
        return None, None, payload
    head = payload[:sep].decode("latin-1", "replace")
    lines = head.splitlines()
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        if ":" in ln:
            k, v = ln.split(":", 1)
            if k.strip().lower() == "content-type":
                ctype = v.strip()
                break
    return status, ctype, payload[sep + seplen :]


def read_warc(
    spark: SparkSession,
    path: str,
    max_payload: int = 64 * 1024 * 1024,
    flush_records: int = 1024,
    flush_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` archives under ``path`` into the
    :data:`WARC_SCHEMA` DataFrame — one task per archive, gzip
    decompression STREAMED (``gzip.GzipFile``, multi-member ok) and
    records flushed out as an Arrow batch every ``flush_records``
    rows or ``flush_bytes`` accumulated payload bytes, so the raw
    (decompressed) archive never materializes whole. A corrupt
    archive yields its records up to the corruption point plus one
    error row (warc_type='__error__', the message in target_uri)
    instead of failing the job."""
    import gzip

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import io

        import pandas as pd

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                acc = 0
                try:
                    data = bytes(blob)
                    if fpath.endswith(".gz") or data[:2] == b"\x1f\x8b":
                        fh = gzip.GzipFile(fileobj=io.BytesIO(data))
                    else:
                        fh = io.BytesIO(data)
                    for rec in parse_warc_stream(fh, max_payload=max_payload):
                        if rec["payload"] is None:
                            rec["warc_type"] = "__oversized__"
                        status = ctype = body = None
                        if rec["payload"] is not None and (
                            rec["content_type"] or ""
                        ).startswith("application/http"):
                            status, ctype, body = split_http_payload(
                                rec["payload"]
                            )
                        rows.append(
                            {
                                "source_file": fpath,
                                "record_id": rec["record_id"],
                                "warc_type": rec["warc_type"],
                                "target_uri": rec["target_uri"],
                                "warc_date": rec["warc_date"],
                                "content_type": rec["content_type"],
                                "content_length": rec["content_length"],
                                "http_status": status,
                                "http_content_type": ctype,
                                "http_body": body,
                                "payload": rec["payload"],
                            }
                        )
                        acc += (rec["content_length"] or 0) + len(body or b"")
                        if len(rows) >= flush_records or acc >= flush_bytes:
                            yield pd.DataFrame(rows)
                            rows, acc = [], 0
                except (ValueError, OSError, EOFError) as e:
                    rows.append(
                        {
                            "source_file": fpath,
                            "record_id": None,
                            "warc_type": "__error__",
                            "target_uri": str(e),
                            "warc_date": None,
                            "content_type": None,
                            "content_length": None,
                            "http_status": None,
                            "http_content_type": None,
                            "http_body": None,
                            "payload": None,
                        }
                    )
                if rows:
                    yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def read_wet(
    spark: SparkSession,
    path: str,
    **kwargs,
) -> DataFrame:
    """Read WET archives (Common Crawl's pre-extracted plain text —
    the input most text-only curation pipelines actually start from)
    into ``(source_file, url, date, n_chars, text)`` rows, ready for
    ``pipeline/`` curation with zero HTML handling.

    WET is WARC framing with ``conversion`` records whose payload is
    the page's extracted UTF-8 text (the sidecar's ``warcinfo``
    header record is dropped here), so this is a narrow projection
    over :func:`read_warc` — same per-archive parallelism, streamed
    gzip, flush batching, and poison-record discipline. The UTF-8
    decode happens JVM-side: binary→string cast is a raw-byte
    passthrough, so ``make_valid_utf8`` then replaces malformed
    sequences (a crawl always contains some) — without it the first
    Arrow transfer or ANSI ``decode`` call would fail the task on a
    single bad byte. The Python layer never touches the text.
    """
    from pyspark.sql import functions as F

    recs = read_warc(spark, path, **kwargs)
    return recs.filter(F.col("warc_type") == "conversion").select(
        "source_file",
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("date"),
        F.col("content_length").alias("n_chars"),
        F.make_valid_utf8(F.col("payload").cast("string")).alias("text"),
    )


def read_wat(
    spark: SparkSession,
    path: str,
    **kwargs,
) -> DataFrame:
    """Read WAT archives (Common Crawl's per-page metadata sidecar:
    one JSON envelope per crawled URI — link graph, headers, title)
    into ``(source_file, url, date, meta_json)`` rows. Parse the
    envelope downstream with ``F.from_json`` / ``get_json_object``
    against the fields a given pipeline needs — shipping a fixed
    envelope schema here would freeze a structure Common Crawl
    documents as format-versioned.

    WAT is WARC framing with ``metadata`` records carrying
    ``application/json``; same scale shape as :func:`read_wet`.
    """
    from pyspark.sql import functions as F

    recs = read_warc(spark, path, **kwargs)
    return recs.filter(
        (F.col("warc_type") == "metadata")
        & F.col("content_type").startswith("application/json")
    ).select(
        "source_file",
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("date"),
        F.make_valid_utf8(F.col("payload").cast("string")).alias("meta_json"),
    )


def read_cdx(
    spark: SparkSession,
    path: str,
) -> DataFrame:
    """Read CDXJ crawl-index files (Common Crawl's ``cc-index``:
    one line per capture — ``<urlkey> <timestamp> <json>``) into
    ``(source_file, urlkey, ts, url, mime, status, digest, length,
    offset, warc_filename)`` rows.

    The index is how a 100 TB pipeline AVOIDS reading 100 TB: filter
    captures by domain/mime/status here (the index is ~1% the size of
    the crawl), then fetch only the matching ``(warc_filename,
    offset, length)`` byte ranges from the archives. ``urlkey`` is
    SURT-form (see ``pipeline/urls.py::surt``), so a domain's
    captures are a contiguous ``startswith`` range — a pushed-down
    prefix filter, not a full-index regex.

    Scale shape: ``spark.read.text`` over the shard glob — per-file
    parallelism (CC publishes ~300 gzip shards per crawl; gzip is not
    splittable, same per-archive discipline as :func:`read_warc`),
    then pure-codegen splitting and one ``from_json``. All JSON
    values arrive as strings (that is the CDXJ convention) and the
    numeric ones are cast; a malformed JSON tail yields nulls in
    those columns, never a task failure, and the raw line survives in
    ``urlkey``/``ts`` for quarantine queries.
    """
    from pyspark.sql import functions as F

    json_schema = (
        "url string, mime string, `mime-detected` string, status string, "
        "digest string, length string, offset string, filename string, "
        "languages string, encoding string, `redirect` string"
    )
    lines = spark.read.text(path).select(
        F.input_file_name().alias("source_file"),
        F.col("value"),
    )
    # try_* variants: a junk line (too few tokens, unparseable date)
    # must yield nulls in those fields, never an
    # ArrayIndexOutOfBounds/ANSI task failure — pinned by
    # test_read_cdx_fuzz_never_fails
    parts = F.split(F.col("value"), " ", 3)
    parsed = lines.select(
        "source_file",
        F.try_element_at(parts, F.lit(1)).alias("urlkey"),
        F.try_to_timestamp(
            F.try_element_at(parts, F.lit(2)), F.lit("yyyyMMddHHmmss")
        ).alias("ts"),
        F.from_json(F.try_element_at(parts, F.lit(3)), json_schema).alias("j"),
    )
    return parsed.select(
        "source_file",
        "urlkey",
        "ts",
        F.col("j.url").alias("url"),
        F.coalesce(F.col("j.mime-detected"), F.col("j.mime")).alias("mime"),
        F.col("j.status").try_cast("int").alias("status"),
        F.col("j.digest").alias("digest"),
        F.col("j.length").try_cast("long").alias("length"),
        F.col("j.offset").try_cast("long").alias("offset"),
        F.col("j.filename").alias("warc_filename"),
    )


def read_warc_ranges(
    spark: SparkSession,
    ranges: DataFrame,
    base_dir: str | None = None,
    max_payload: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Fetch ONLY the records a CDX query selected: ``ranges`` has
    ``(warc_filename, offset, length)`` rows (exactly what
    :func:`read_cdx` returns), and each range is seek-read from its
    archive and parsed — the crawl itself is never scanned. This is
    the second half of the index-first contract: ``read_cdx`` filters
    ~1% of the corpus relationally, this reads just those bytes.

    Common Crawl archives are per-record gzip members, so a
    ``(offset, length)`` slice is a self-contained ``.gz`` blob with
    exactly one record inside; plain ``.warc`` slices parse directly.
    Ranges are grouped per archive and visited in offset order (one
    open + monotonic seeks, no re-reads); the grouping shuffle moves
    only the 24-byte range rows, never payloads. POSIX ``seek`` is
    the I/O here — on an object store the same contract is a ranged
    GET per (offset, length), which is the documented production
    seam. A bad range or corrupt member yields one ``__error__`` row
    (message in target_uri), never a task failure.
    """
    import gzip

    from pyspark.sql import functions as F

    # a CDX quarantine row (null filename/offset/length) cannot be
    # fetched — drop it here rather than TypeError-ing a task; the
    # nulls are already visible in the index for auditing
    picked = ranges.filter(
        F.col("warc_filename").isNotNull()
        & F.col("offset").isNotNull()
        & F.col("length").isNotNull()
    ).groupBy("warc_filename").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("offset"), F.col("length")))
        ).alias("__ranges")
    )

    def fetch(batches):
        import io
        import os

        import pandas as pd

        def err_row(src, msg):
            return {
                "source_file": src,
                "record_id": None,
                "warc_type": "__error__",
                "target_uri": msg,
                "warc_date": None,
                "content_type": None,
                "content_length": None,
                "http_status": None,
                "http_content_type": None,
                "http_body": None,
                "payload": None,
            }

        for pdf in batches:
            for fname, rs in zip(pdf["warc_filename"], pdf["__ranges"]):
                path = fname
                if base_dir is not None:
                    path = os.path.join(base_dir, fname)
                if path.startswith("file:"):
                    path = path[len("file:"):]
                rows = []
                try:
                    fh = open(path, "rb")
                except OSError as e:
                    yield pd.DataFrame([err_row(fname, str(e))])
                    continue
                with fh:
                    for r in rs:
                        try:
                            fh.seek(int(r["offset"]))
                            chunk = fh.read(int(r["length"]))
                            if len(chunk) < int(r["length"]):
                                raise ValueError(
                                    f"range past EOF at offset {r['offset']}"
                                )
                            if chunk[:2] == b"\x1f\x8b":
                                chunk = gzip.decompress(chunk)
                            for rec in parse_warc_stream(
                                io.BytesIO(chunk), max_payload=max_payload
                            ):
                                if rec["payload"] is None:
                                    rec["warc_type"] = "__oversized__"
                                status = ctype = body = None
                                if rec["payload"] is not None and (
                                    rec["content_type"] or ""
                                ).startswith("application/http"):
                                    status, ctype, body = split_http_payload(
                                        rec["payload"]
                                    )
                                rows.append(
                                    {
                                        "source_file": fname,
                                        "record_id": rec["record_id"],
                                        "warc_type": rec["warc_type"],
                                        "target_uri": rec["target_uri"],
                                        "warc_date": rec["warc_date"],
                                        "content_type": rec["content_type"],
                                        "content_length": rec["content_length"],
                                        "http_status": status,
                                        "http_content_type": ctype,
                                        "http_body": body,
                                        "payload": rec["payload"],
                                    }
                                )
                        except (ValueError, OSError, EOFError) as e:
                            rows.append(err_row(fname, str(e)))
                if rows:
                    yield pd.DataFrame(rows)

    return picked.mapInPandas(fetch, WARC_SCHEMA)
