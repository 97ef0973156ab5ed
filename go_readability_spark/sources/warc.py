"""WARC source: read Common-Crawl-style WARC archives into the `pages`
table shape (url, warc_ts, html, ...). Stdlib-only parser for the ISO
28500 record format (public spec; Common Crawl publishes its corpus this
way): records are `WARC/1.x` header blocks + Content-Length payloads,
archives are concatenations of per-record gzip members (which Python's
gzip reads transparently as one stream).

Spark integration ships archive PATHS to the executors and parses each
file inside mapInPandas (archive_reader) — WARC's framing has no
record-aligned split points a generic splitter could use, and Common
Crawl's ~1 GB archive granularity IS the parallelism unit (one task per
archive, tens of thousands of archives per crawl). The bytes never touch
the JVM: each Python task opens and reads its own files, so per-task
memory is sized per-core like any executor instead of stacking every
concurrent archive on the shared driver heap (which OOMed the 1M WET
volume run under the old binaryFile route).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def _read_headers(stream) -> dict | None:
    """Read a CRLF-terminated header block; None at EOF. Keys lowercased."""
    line = stream.readline()
    # tolerate record separators (blank lines) before the version line
    while line in (b"\r\n", b"\n"):
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    headers = {}
    while True:
        line = stream.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return headers


def iter_warc_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """(warc_headers, payload) per record from a .warc or .warc.gz blob."""
    if raw[:2] == b"\x1f\x8b":
        # stream members instead of gzip.decompress(raw): a ~1 GB Common
        # Crawl archive inflates to ~4-5 GB, and materializing that next
        # to the compressed blob would OOM a default-sized executor;
        # GzipFile reads all concatenated members transparently
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    while True:
        headers = _read_headers(stream)
        if headers is None:
            return
        length = max(0, int(headers.get("content-length", "0")))
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated tail record: provably incomplete, drop it
        yield headers, payload


def _split_http_response(payload: bytes) -> tuple[int, dict, bytes] | None:
    """HTTP response payload -> (status, http_headers, body); None if
    malformed. Whichever header/body separator (CRLFCRLF or LFLF) occurs
    FIRST wins — LF-only headers whose body happens to contain a CRLFCRLF
    must not missplit."""
    crlf, lf = payload.find(b"\r\n\r\n"), payload.find(b"\n\n")
    if crlf == -1 and lf == -1:
        return None
    if crlf != -1 and (lf == -1 or crlf <= lf):
        sep, nl = crlf, b"\r\n"
    else:
        sep, nl = lf, b"\n"
    head = payload[:sep].split(nl)
    if not head or not head[0].startswith(b"HTTP/"):
        return None
    parts = head[0].split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None
    headers = {}
    for line in head[1:]:
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return status, headers, payload[sep + 2 * len(nl):]


def _dechunk(body: bytes) -> bytes:
    """Decode a Transfer-Encoding: chunked body (hex-size lines, CRLF or
    bare-LF framing); stops cleanly at the terminal 0-chunk or on any
    malformed size line."""
    out = bytearray()
    i = 0
    while True:
        j = body.find(b"\r\n", i)
        nl = 2
        k = body.find(b"\n", i)
        if k != -1 and (j == -1 or k < j):
            j, nl = k, 1
        if j == -1:
            break
        try:
            size = int(body[i:j].split(b";")[0].strip() or b"0", 16)
        except ValueError:
            break
        if size == 0:
            break
        start = j + nl
        out += body[start:start + size]
        i = start + size
        if body[i:i + 2] == b"\r\n":
            i += 2
        elif body[i:i + 1] == b"\n":
            i += 1
    return bytes(out)


def _decode_http_body(http_headers: dict, body: bytes) -> bytes | None:
    """Undo Transfer-Encoding / Content-Encoding; None when the encoding
    is unknown or the payload doesn't decode (record is skipped rather
    than emitting framing bytes or compressed bytes as page html)."""
    if "chunked" in http_headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = http_headers.get("content-encoding", "").strip().lower()
    if enc in ("", "identity"):
        return body
    try:
        if enc in ("gzip", "x-gzip"):
            return gzip.decompress(body)
        if enc == "deflate":
            import zlib

            try:
                return zlib.decompress(body)
            except zlib.error:
                return zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
    except Exception:
        return None
    return None  # br/zstd/unknown: no stdlib decoder — skip the record


def _parse_warc_date(headers: dict) -> datetime | None:
    """WARC-Date → naive UTC. Offsets are CONVERTED to UTC, not truncated
    (the spec mandates Z, but real-world writers emit offsets — dropping
    the tz would skew warc_ts by the offset)."""
    raw_ts = headers.get("warc-date")
    if not raw_ts:
        return None
    try:
        dt = datetime.fromisoformat(raw_ts.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def warc_bytes_to_page_rows(raw: bytes) -> Iterator[dict]:
    """HTML 2xx response records of one archive as pages-shaped dicts.
    Non-2xx responses (redirect stubs, error pages) are crawl noise, not
    corpus pages; chunked / gzip / deflate bodies are decoded, records
    with undecodable encodings are skipped rather than emitting framing
    or compressed bytes as html."""
    for headers, payload in iter_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        parsed = _split_http_response(payload)
        if parsed is None:
            continue
        status, http_headers, body = parsed
        if not 200 <= status < 300:
            continue
        ctype = http_headers.get("content-type", "")
        if "html" not in ctype.lower():
            continue
        body = _decode_http_body(http_headers, body)
        if body is None:
            continue
        yield {
            "url": url,
            "warc_ts": _parse_warc_date(headers),
            "html": body,
            "text": None,
            "lang": None,
        }


def warc_bytes_to_record_rows(raw: bytes) -> Iterator[dict]:
    """Full-fidelity record table of one archive: response records (with
    their decoded html AND the recorded WARC-Payload-Digest) and
    `revisit` records — Common Crawl's server-side dedup pointers
    (WARC/1.1 §6.7.2): when a re-fetch returns content already stored,
    the crawler writes a body-less revisit record carrying the payload
    digest of the original.  A real crawl snapshot is 10-30% revisits;
    dropping them (what pages_from_warc does, correctly, for the
    pages-only view) silently loses those URLs' membership in the
    corpus.  `resolve_revisits` (operators/revisits.py) joins them back
    to the stored payloads by digest."""
    for headers, payload in iter_warc_records(raw):
        wtype = headers.get("warc-type")
        url = headers.get("warc-target-uri")
        if not url or wtype not in ("response", "revisit"):
            continue
        digest = headers.get("warc-payload-digest")
        if wtype == "revisit":
            yield {
                "url": url,
                "warc_ts": _parse_warc_date(headers),
                "record_type": "revisit",
                "digest": digest,
                "refers_to": headers.get("warc-refers-to-target-uri"),
                "html": None,
            }
            continue
        parsed = _split_http_response(payload)
        if parsed is None:
            continue
        status, http_headers, body = parsed
        if not 200 <= status < 300:
            continue
        ctype = http_headers.get("content-type", "")
        if "html" not in ctype.lower():
            continue
        body = _decode_http_body(http_headers, body)
        if body is None:
            continue
        yield {
            "url": url,
            "warc_ts": _parse_warc_date(headers),
            "record_type": "response",
            "digest": digest,
            "refers_to": None,
            "html": body,
        }


WARC_RECORDS_SCHEMA = (
    "url string, warc_ts timestamp, record_type string, digest string, "
    "refers_to string, html binary"
)


def records_from_warc(spark, path: str, strict: bool = False) -> DataFrame:
    """Read .warc/.warc.gz archives into the full-fidelity record table
    (responses + revisits, see warc_bytes_to_record_rows).  Same
    one-archive-per-task parallelism and corrupt-archive containment as
    :func:`pages_from_warc`."""
    return archive_reader(spark, path, warc_bytes_to_record_rows,
                          schema=WARC_RECORDS_SCHEMA, strict=strict)


def wet_bytes_to_doc_rows(raw: bytes) -> Iterator[dict]:
    """Text `conversion` records of a WET archive (Common Crawl's
    pre-extracted text sidecar format — same ISO 28500 framing, payload is
    the plain text itself, no HTTP envelope)."""
    for headers, payload in iter_warc_records(raw):
        if headers.get("warc-type") != "conversion":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        yield {
            "url": url,
            "warc_ts": _parse_warc_date(headers),
            "text": payload.decode("utf-8", errors="replace"),
        }


def archive_reader(spark, path, row_fn, schema, strict: bool = False,
                   num_partitions: int | None = None):
    """Shared archive-scan for every whole-archive reader (WARC records/
    pages, WET, WAT): ship PATHS through the JVM and let each Python
    task open and read its own files — the pages_from_fetch_plan
    pattern.

    The previous binaryFile route materialized every archive's bytes on
    the JVM heap before the Arrow handoff; at 32 concurrent tasks over
    the shared local-mode heap that OOMed the 1M-doc WET volume run (and
    would cap whole-archive WARC reads the same way — Common Crawl
    archives are ~1 GB each). With path streaming the JVM never touches
    archive bytes; per-task memory lives in the Python worker, which is
    sized per-core like any executor. Remote (hdfs://, s3a://) locations
    fall back to binaryFile — listing and opening are filesystem-API
    work there; local/posix is this sandbox's (and the tests') path.

    `path` may be a directory, a single file, or an explicit file list
    (the file-aligned segmentation path)."""
    files: list[str] | None = None
    if isinstance(path, (list, tuple)):
        files = [str(p) for p in path]
    else:
        p = str(path)
        root = p[len("file://"):] if p.startswith("file://") else p
        if "://" in p and not p.startswith("file://"):
            files = None  # remote: binaryFile fallback below
        elif os.path.isdir(root):
            import glob as _glob

            files = sorted(
                f for f in _glob.glob(os.path.join(root, "**"),
                                      recursive=True)
                if os.path.isfile(f)
                and not os.path.basename(f).startswith((".", "_")))
        else:
            files = [root]

    if files is None:
        blobs = spark.read.format("binaryFile").load(path).select("content")
        if num_partitions:
            blobs = blobs.repartition(num_partitions)
        return blobs.mapInPandas(archive_parser(row_fn, strict),
                                 schema=schema)

    n_parts = num_partitions or max(1, min(len(files), 1024))
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "path string").repartition(n_parts, "path")

    def parse_paths(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for fpath in pdf["path"]:
                try:
                    with open(fpath, "rb") as fh:
                        rows = list(row_fn(fh.read()))
                except Exception:
                    if strict:
                        raise
                    continue  # corrupt/unreadable archive: skip it
                if rows:
                    out = pd.DataFrame(rows)
                    out["warc_ts"] = pd.to_datetime(out["warc_ts"],
                                                    errors="coerce")
                    yield out

    return paths_df.mapInPandas(parse_paths, schema=schema)


def archive_parser(row_fn, strict: bool = False):
    """The shared mapInPandas body for every archive reader (batch WARC,
    WET, streaming WARC): parse each file's bytes with `row_fn`, skip the
    archive on any error unless strict — corrupt-archive semantics live in
    exactly one place."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                try:
                    rows = list(row_fn(bytes(content)))
                except Exception:
                    if strict:
                        raise
                    continue  # corrupt archive: skip, don't kill the job
                if rows:
                    out = pd.DataFrame(rows)
                    out["warc_ts"] = pd.to_datetime(out["warc_ts"], errors="coerce")
                    yield out

    return parse


def docs_from_wet(spark, path: str, strict: bool = False) -> DataFrame:
    """Read .wet/.wet.gz archives under `path` into (url, warc_ts, text) —
    the documents-shaped on-ramp for corpora where extraction already
    happened upstream (Common Crawl publishes WET alongside WARC). Same
    one-archive-per-task parallelism and corrupt-archive containment as
    :func:`pages_from_warc`."""
    return archive_reader(
        spark, path, wet_bytes_to_doc_rows,
        schema="url string, warc_ts timestamp, text string", strict=strict)


def write_wet(records: list[tuple[str, datetime, str]], gz: bool = True) -> bytes:
    """Build a WET blob from (url, ts, text) triples — for tests."""
    return b"".join(
        warc_record("conversion", url, ts, "text/plain",
                    text.encode("utf-8"), gz=gz)
        for url, ts, text in records)


def pages_from_warc(
    spark, path: str | list[str], num_partitions: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """Read .warc/.warc.gz archives under `path` (a directory, or an
    explicit archive list — the file-aligned segmentation path,
    plans/crawl.py segment_input_files) into the pages shape.
    One archive file = one parse unit; records stream out as Arrow
    batches.

    A truncated gzip member or garbled record framing aborts only that
    archive (strict=False, the default): at crawl scale a handful of
    corrupt archives among tens of thousands must not kill the job — they
    are skipped and the job proceeds. strict=True re-raises for debugging.
    """
    from ..plans.schema import PAGES_SCHEMA

    return archive_reader(spark, path, warc_bytes_to_page_rows,
                          schema=PAGES_SCHEMA, strict=strict,
                          num_partitions=num_partitions)


def pages_from_fetch_plan(
    plan: DataFrame, base_dir: str, strict: bool = False,
    chunk_bytes: int = 1 << 30,
) -> DataFrame:
    """Execute a crawl-plan worklist with BYTE-RANGE reads: each plan row
    (filename, offset, length) names one gzip member inside a .warc.gz
    archive under `base_dir` (the Common Crawl convention — offsets index
    the COMPRESSED stream), and only those members are read — the rest of
    the archive is never touched.  This is the stage that makes
    CDX -> robots -> frontier -> fetch -> extract a closed loop instead
    of a plan: the index selection (sources/cdx.py) already pruned ~99%
    of the corpus, and this reads exactly the surviving ranges.

    Plan shape: repartition by (filename, offset div chunk_bytes)
    co-locates each ~chunk of one archive on one task;
    sortWithinPartitions(filename, offset) turns the chunk into a
    monotone sweep, so each file is opened once per task and read
    sequentially (on object storage each read is one ranged GET — the
    seek+read here is its filesystem equivalent; adjacent members
    coalesce in the OS readahead).  The default chunk (1 GiB) equals
    Common Crawl's archive granularity, so normal archives stay one
    task; a pathological 100 GB archive splits into 100 independent
    monotone sweeps instead of serializing through one task.  Parsing
    reuses the exact record pipeline of the whole-archive path
    (warc_bytes_to_page_rows), so a ranged fetch of every member is
    byte-identical to reading the whole archive.  Corrupt members skip
    (strict=False) like corrupt archives do elsewhere."""
    import os

    import pandas as pd

    from pyspark.sql import functions as F

    from ..plans.schema import PAGES_SCHEMA

    ranges = (
        plan.select("filename", "offset", "length")
        .repartition("filename",
                     F.floor(F.col("offset") / F.lit(int(chunk_bytes))))
        .sortWithinPartitions("filename", "offset")
    )

    def fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cur_name, fh = None, None
        try:
            for pdf in batches:
                rows = []
                for fn, off, ln in zip(
                    pdf["filename"], pdf["offset"], pdf["length"]
                ):
                    if fn != cur_name:
                        if fh is not None:
                            fh.close()
                        cur_name, fh = fn, None
                        try:
                            fh = open(os.path.join(base_dir, str(fn)), "rb")
                        except OSError:
                            # a missing/unreadable archive among 10^5
                            # must skip its ranges, not kill the job
                            # (same containment as corrupt members)
                            if strict:
                                raise
                    if fh is None:
                        continue  # ranges of a missing archive
                    fh.seek(int(off))
                    blob = fh.read(int(ln))
                    try:
                        rows.extend(warc_bytes_to_page_rows(blob))
                    except Exception:
                        if strict:
                            raise
                        continue  # corrupt member: skip, don't kill the job
                if rows:
                    out = pd.DataFrame(rows)
                    out["warc_ts"] = pd.to_datetime(
                        out["warc_ts"], errors="coerce")
                    yield out
        finally:
            if fh is not None:
                fh.close()

    return ranges.mapInPandas(fetch, schema=PAGES_SCHEMA)


def warc_record(warc_type: str, url: str, ts: datetime,
                content_type: str | None, body: bytes,
                extra_headers: bytes = b"",
                version: str = "WARC/1.0", gz: bool = True) -> bytes:
    """One ISO 28500 record (header block + body + record separator),
    optionally its own gzip member — the single framing implementation
    behind write_warc / write_wet / write_revisit / wat.write_wat.
    content_type=None omits the header (body-less revisit records)."""
    ct_hdr = b"" if content_type is None else (
        b"Content-Type: " + content_type.encode() + b"\r\n")
    headers = (
        version.encode() + b"\r\n"
        b"WARC-Type: " + warc_type.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
        + extra_headers + ct_hdr +
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
    )
    rec = headers + body + b"\r\n\r\n"
    return gzip.compress(rec) if gz else rec


def write_warc(records: list[tuple[str, datetime, bytes]], gz: bool = True,
               digests: list[str] | None = None) -> bytes:
    """Build a spec-shaped WARC blob from (url, ts, html_body) triples —
    for tests and examples (each record its own gzip member, like Common
    Crawl's archives).  `digests` optionally carries a parallel list of
    WARC-Payload-Digest values to record (the anchor revisit records
    point at)."""
    out = b""
    for idx, (url, ts, body) in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        digest_hdr = b""
        if digests is not None and digests[idx]:
            digest_hdr = (b"WARC-Payload-Digest: "
                          + digests[idx].encode() + b"\r\n")
        out += warc_record(
            "response", url, ts, "application/http; msgtype=response",
            http, extra_headers=digest_hdr, gz=gz)
    return out


def write_revisit(url: str, ts: datetime, digest: str,
                  refers_to: str | None = None, gz: bool = True) -> bytes:
    """Build one body-less `revisit` record (WARC/1.1 §6.7.2) — the
    server-side dedup pointer records_from_warc parses."""
    refers_hdr = b""
    if refers_to:
        refers_hdr = (b"WARC-Refers-To-Target-URI: "
                      + refers_to.encode() + b"\r\n")
    extra = (
        b"WARC-Payload-Digest: " + digest.encode() + b"\r\n"
        + refers_hdr +
        b"WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
        b"identical-payload-digest\r\n"
    )
    return warc_record("revisit", url, ts, None, b"",
                       extra_headers=extra, version="WARC/1.1", gz=gz)
