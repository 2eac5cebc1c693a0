"""Common-Crawl-style WARC source/sink (engine extension).

BASELINE.json's north star is a frontier over "Common-Crawl-style
web pages"; Common Crawl ships those pages as WARC/1.0 files
(ISO 28500), one gzip member per record, ~1 GiB per file.  This
module makes that the engine's on-disk interchange format alongside
parquet: ``write_warc`` shards a pages DataFrame into
member-per-record ``.warc.gz`` files and ``read_warc`` turns a
directory of them back into the input_hint table shape
``(url, warc_ts, html)`` (``text`` is then DERIVED via
``operators.parse.extract_text`` — the byte-identity invariant, so
a corpus routed through WARC is indistinguishable from one read
from parquet).

Execution model at 100 TB:

- **The file is the parallelism unit.**  Common Crawl's own layout
  (tens of thousands of ~1 GiB files per crawl) maps 1:1 onto Spark
  tasks via the ``binaryFile`` source; record-level splitting of a
  gzip stream is not possible without an index, and nobody needs it
  when the file count is 10^4-10^5.  ``read_warc`` is therefore
  ``binaryFile scan -> ONE mapInPandas crossing per file``.
- **Member-per-record gzip** (the Common Crawl convention) means a
  reader can stop at any record boundary and a writer never holds
  more than one record in the compressor; stdlib ``gzip`` handles
  concatenated members natively on decompress.
- **Writer shards by url hash** (``groupBy(shard).applyInPandas``)
  so file contents are a pure function of the data — same corpus,
  same shard count, byte-identical files (gzip mtime pinned to 0).
  One group = one file; pick ``n_shards`` so a shard is ~1 GiB at
  the target corpus size, exactly the Common Crawl sizing rule.
  ``out_dir`` must be executor-visible (shared FS on a cluster).

Record framing follows ISO 28500 §4: CRLF header lines, a
``Content-Length`` octet count, and a CRLF CRLF terminator after
the block; response records carry an ``application/http`` payload
whose body is the raw html bytes.  The reader skips non-response
records (warcinfo, request, metadata) like every CC consumer does.
"""

from __future__ import annotations

import datetime as dt
import gzip
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
    ]
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("path", StringType()),
        StructField("n_records", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


# ---------------------------------------------------------------------
# record-level framing (pure functions, run on executors)
# ---------------------------------------------------------------------


def _warc_headers(fields: list[tuple[str, str]], body: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in fields
    )
    head += f"Content-Length: {len(body)}\r\n\r\n".encode()
    return head + body + b"\r\n\r\n"


def response_record(url: str, ts: dt.datetime, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping ``html`` in a minimal
    HTTP/1.1 block (the Common Crawl payload convention).

    The record id is uuid5 of (url, ts) — deterministic, so the
    writer's output bytes are a pure function of its input rows.
    """
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode()
        + html
    )
    stamp = ts.strftime(_WARC_DATE_FMT)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{stamp}")
    return _warc_headers(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Date", stamp),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http,
    )


def warcinfo_record(filename: str) -> bytes:
    body = b"software: spacetime_crawler4py_spark\r\nformat: WARC File Format 1.0\r\n"
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"warcinfo|{filename}")
    return _warc_headers(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Date", dt.datetime(2024, 1, 1).strftime(_WARC_DATE_FMT)),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def parse_warc(data: bytes) -> Iterator[tuple[str, dt.datetime, bytes]]:
    """Yield (url, warc_ts, html) from one WARC file's bytes.

    Accepts plain or gzipped input; concatenated gzip members (the
    CC record-per-member layout) decompress in one stdlib call.
    Tolerates LF-only terminators after the block (robustness — the
    spec says CRLF CRLF) and skips non-response records.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        first = True
        for line in data[pos:head_end].split(b"\r\n"):
            if first:  # WARC/1.0 version line
                first = False
                continue
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        body_start = head_end + 4
        clen = int(headers.get("content-length", "0"))
        body = data[body_start : body_start + clen]
        pos = body_start + clen
        if headers.get("warc-type") == "response":
            url = headers["warc-target-uri"]
            ts = dt.datetime.strptime(headers["warc-date"], _WARC_DATE_FMT)
            _, sep, html = body.partition(b"\r\n\r\n")
            yield url, ts, html if sep else b""


# ---------------------------------------------------------------------
# distributed sink
# ---------------------------------------------------------------------


def write_warc(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    compress: bool = True,
) -> list[dict]:
    """Shard ``df(url, warc_ts, html)`` into deterministic
    ``part-{shard:05d}.warc[.gz]`` files under ``out_dir``.

    Shard = top-60-md5-bits of the url mod ``n_shards`` (the
    operators/sampling hash idiom); records within a file are
    url-sorted; gzip mtime is pinned to 0 — so the files are a
    byte-pure function of (rows, n_shards).  One applyInPandas
    group per file keeps the writer's memory at one-shard scale;
    size ``n_shards`` for ~1 GiB shards (the CC convention).

    Returns the collected manifest [{shard, path, n_records,
    n_bytes}] — one row per file, safe to collect at any scale.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0])
        name = f"part-{shard:05d}{ext}"
        path = os.path.join(out_dir, name)
        pdf = pdf.sort_values("url")
        chunks = [warcinfo_record(name)]
        for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
            rec = response_record(
                url, ts.to_pydatetime(), bytes(html)
            )
            chunks.append(rec)
        if compress:
            blob = b"".join(
                gzip.compress(c, compresslevel=6, mtime=0) for c in chunks
            )
        else:
            blob = b"".join(chunks)
        with open(path, "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [path],
                "n_records": [len(pdf)],
                "n_bytes": [len(blob)],
            }
        )

    shard = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("warc"), F.col("url"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    manifest = (
        df.select("url", "warc_ts", "html")
        .withColumn("_shard", shard)
        .groupBy("_shard")
        .applyInPandas(_write_group, MANIFEST_SCHEMA)
        .collect()
    )
    return [r.asDict() for r in sorted(manifest, key=lambda r: r["shard"])]


# ---------------------------------------------------------------------
# distributed source
# ---------------------------------------------------------------------


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``(url, warc_ts, html)`` from a directory/glob of WARC files.

    binaryFile scan (one task per file — the CC parallelism model)
    into one Arrow crossing that runs the stdlib record parser.
    Only the ``content`` column is read, so the scan prunes the
    binaryFile metadata columns.
    """
    files = spark.read.format("binaryFile").load(path).select("content")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            stamps: list[dt.datetime] = []
            htmls: list[bytes] = []
            for blob in pdf["content"]:
                for url, ts, html in parse_warc(bytes(blob)):
                    urls.append(url)
                    stamps.append(ts)
                    htmls.append(html)
            yield pd.DataFrame(
                {"url": urls, "warc_ts": stamps, "html": htmls}
            )

    return files.mapInPandas(_gen, WARC_SCHEMA)
