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
``binaryFile`` scan hands each archive to one task, and the record
parse is a generator inside ``mapInPandas`` (Arrow-batched out, so a
1 GB archive never materializes as Python row objects — records
stream out batch by batch). Common Crawl ships ~1 GB archives ×
tens of thousands per dump: ample parallelism with no split logic.
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


def parse_warc_records(blob: bytes):
    """Yield dicts of parsed records from one (decompressed) WARC
    blob. Pure function — shared by the Spark reader and tests."""
    i = 0
    n = len(blob)
    while i < n:
        # skip inter-record CRLFs
        while i < n and blob[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            break
        eol = blob.find(b"\n", i)
        if eol < 0:
            break
        version = blob[i:eol].strip()
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {version[:20]!r}")
        i = eol + 1
        headers = {}
        while i < n:
            eol = blob.find(b"\n", i)
            if eol < 0:
                raise ValueError("truncated WARC header")
            line = blob[i:eol].rstrip(b"\r")
            i = eol + 1
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
        if i + clen > n:
            raise ValueError("WARC payload exceeds file size")
        payload = blob[i : i + clen]
        i += clen
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": payload,
        }


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
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` archives under ``path`` into the
    :data:`WARC_SCHEMA` DataFrame — one task per archive, records
    streamed out via Arrow batches. A corrupt archive yields its
    records up to the corruption point plus one error row
    (warc_type='__error__', the message in target_uri) instead of
    failing the job."""
    import gzip

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                try:
                    data = bytes(blob)
                    if fpath.endswith(".gz") or data[:2] == b"\x1f\x8b":
                        data = gzip.decompress(data)  # multi-member ok
                    for rec in parse_warc_records(data):
                        if len(rec["payload"]) > max_payload:
                            rec["payload"] = None
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
