"""WARC/WET container walking: the Common Crawl ingestion format.

A pretraining-data pipeline's documents arrive inside WARC files
(ISO 28500 / the public WARC 1.0-1.1 spec): a WARC file is a plain
concatenation of records, each framed as

    WARC/1.0<CRLF>
    Header-Name: value<CRLF>          (named headers, any order)
    ...<CRLF>
    <CRLF>                            (blank line ends the block)
    <exactly Content-Length payload bytes>
    <CRLF><CRLF>                      (record terminator)

WET files are WARC files whose content records are ``WARC-Type:
conversion`` with ``Content-Type: text/plain`` — the extracted page
text, which is what the dedup / quality / lang-id operators in this
engine consume. In the wild ``.warc.gz`` compresses EACH RECORD AS
ITS OWN GZIP MEMBER and concatenates the members, so readers can
split a file at member boundaries without decompressing the whole
thing; stdlib ``zlib`` walks concatenated members via
``decompressobj(31)`` + ``unused_data``.

This module is the x146-x150 walker pattern applied to the text
pipeline's front door:

- ``warc_records(payload)`` — pure byte-walk, one dict PER RECORD
  (a WARC payload is a container of many records, unlike the
  one-row image walkers), every read bounds-checked, damage counted
  and never hidden (``clean`` flips on truncation, missing
  Content-Length, bad framing, or inter-record garbage).
- ``encode_warc(records, ...)`` — the inverse fixture generator
  (deterministic: gzip members are built with ``zlib.compressobj``,
  which embeds no timestamp).
- ``extract_warc_records(df)`` — Arrow-batched ``mapInPandas`` that
  EXPLODES payloads into one output row per record in the SCAN
  stage: no shuffle, per-payload error containment via
  ``strict=False``.
- ``read_warc(spark, path)`` — the source: ``binaryFile`` scan →
  ``extract_warc_records``. One task per WARC file; at 100 TB the
  unit of parallelism is the file (Common Crawl ships ~1 GB
  segments, ~80k files per crawl — far more files than executors,
  so file-granular is the right grain; member-granular splitting
  would only matter for pathological multi-TB single files).

Reference: engine-added (SURVEY.md §2.2 text-pipeline family); WARC
1.0/1.1 public spec layouts only.
"""

from __future__ import annotations

import zlib
from typing import TYPE_CHECKING, Iterable, Iterator

if TYPE_CHECKING:  # pragma: no cover - typing only
    import pandas as pd
    from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "warc_records",
    "encode_warc",
    "extract_warc_records",
    "read_warc",
]

#: Output columns of one record row (id + parse_error added by the
#: extract wrapper). Types are the mapInPandas schema's.
_WARC_COLS = (
    ("rec_index", "int"),
    ("warc_type", "string"),
    ("target_uri", "string"),
    ("record_id", "string"),
    ("warc_date", "string"),
    ("content_type", "string"),
    ("content_length", "bigint"),
    ("n_headers", "int"),
    ("http_status", "int"),
    ("http_content_type", "string"),
    ("text", "string"),
    ("clean", "int"),
    ("compressed", "int"),
)


def _http_response_meta(body: bytes) -> "tuple[int | None, str | None, bytes | None, int]":
    """Parse an ``application/http`` record payload (raw WARC
    response records — the bulk of a Common Crawl drop): status line,
    header block, entity body. Returns (status, content_type, body,
    clean). Handles ``Content-Encoding: gzip/deflate`` with stdlib
    zlib (failure → body None, clean=0 — counted, not hidden); a
    payload that doesn't start with ``HTTP/`` is damage, not a
    different format (the WARC header already declared msgtype)."""
    if body[:5] != b"HTTP/":
        return None, None, None, 0
    clean = 1
    head, sep, entity = body.partition(b"\r\n\r\n")
    if not sep:
        clean = 0  # header block never terminated: status may still read
        entity = b""
    lines = head.split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    status = None
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    else:
        clean = 0
    ctype = None
    encoding = None
    for line in lines[1:]:
        name, hsep, value = line.partition(b":")
        if not hsep:
            clean = 0
            continue
        key = name.strip().lower()
        if key == b"content-type":
            ctype = value.strip().decode("utf-8", "replace")
        elif key == b"content-encoding":
            encoding = value.strip().lower()
    if encoding in (b"gzip", b"deflate") and entity:
        try:
            entity = zlib.decompress(
                entity, 47
            )  # 47 = auto-detect zlib/gzip wrapper
        except zlib.error:
            return status, ctype, None, 0
    return status, ctype, entity, clean

_CRLF = b"\r\n"


def _gunzip_members(payload: bytes) -> tuple[bytes, int]:
    """Decompress a concatenation of gzip members (the .warc.gz wire
    layout) with stdlib zlib, returning (bytes, n_members). A corrupt
    TAIL yields what decompressed so far — the record walk then sees
    a truncated record and flips ``clean``; a head that yields
    nothing raises ValueError (whole-payload containment)."""
    out = bytearray()
    members = 0
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        obj = zlib.decompressobj(31)
        try:
            out += obj.decompress(rest)
        except zlib.error:
            break
        if not obj.eof:
            break  # member cut mid-stream: keep what decompressed
        members += 1
        rest = obj.unused_data
    if not members:
        raise ValueError("not a WARC payload (bad gzip head)")
    return bytes(out), members


def warc_records(payload: bytes) -> "list[dict]":
    """Walk a WARC/WET payload into one dict per record.

    Per-record fields: ``rec_index`` (0-based file order),
    ``warc_type`` / ``target_uri`` / ``record_id`` / ``warc_date`` /
    ``content_type`` (named headers; None when absent),
    ``content_length`` (the DECLARED length), ``n_headers`` (header
    lines in the block), ``text`` (the payload decoded UTF-8-replace
    when content_type says ``text/*``, else None — a truncated
    record yields the bytes that exist), ``clean`` (1 unless the
    record is damaged: truncated payload, missing/garbled
    Content-Length, malformed header line, or missing CRLF-CRLF
    terminator), and ``compressed`` (1 when the payload arrived as
    gzip members — a file-level fact repeated per row so the
    exploded output stays self-describing).

    Damage containment mirrors the image walkers: a payload that is
    not WARC at all (no version line, bad gzip head) raises
    ValueError; garbage BETWEEN records is reported as its own row
    (``warc_type='garbage'``, clean=0) and ends the walk — counted,
    never silently skipped."""
    compressed = 0
    n = len(payload)
    if payload[:2] == b"\x1f\x8b":
        payload, _members = _gunzip_members(payload)
        compressed = 1
        n = len(payload)
    if payload[:5] != b"WARC/":
        raise ValueError("not a WARC payload (no version line)")

    records: list[dict] = []
    pos = 0
    while pos < n:
        if payload[pos : pos + 5] != b"WARC/":
            # mid-stream garbage: count it as a terminal damaged row
            records.append(
                {
                    "rec_index": len(records),
                    "warc_type": "garbage",
                    "target_uri": None,
                    "record_id": None,
                    "warc_date": None,
                    "content_type": None,
                    "content_length": None,
                    "n_headers": None,
                    "http_status": None,
                    "http_content_type": None,
                    "text": None,
                    "clean": 0,
                    "compressed": compressed,
                }
            )
            break
        rec = {
            "rec_index": len(records),
            "warc_type": None,
            "target_uri": None,
            "record_id": None,
            "warc_date": None,
            "content_type": None,
            "content_length": None,
            "n_headers": 0,
            "http_status": None,
            "http_content_type": None,
            "text": None,
            "clean": 1,
            "compressed": compressed,
        }
        # version line
        eol = payload.find(_CRLF, pos)
        if eol < 0:
            rec["clean"] = 0
            records.append(rec)
            break
        pos = eol + 2
        # header block: named lines until the blank line. The spec
        # allows RFC-2822-style FOLDING (a continuation line starts
        # with SP/HT and extends the previous value); a name that is
        # empty or contains whitespace is not a legal field token —
        # counted as damage, never guessed at.
        content_length = None
        hdrs: list[list[bytes]] = []
        while True:
            eol = payload.find(_CRLF, pos)
            if eol < 0:
                rec["clean"] = 0
                pos = n
                break
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line = end of header block
            if line[0:1] in (b" ", b"\t") and hdrs:
                hdrs[-1][1] += b" " + line.strip()
                continue
            name, sep, value = line.partition(b":")
            name = name.strip()
            if not sep or not name or any(
                c in name for c in (b" ", b"\t")
            ):
                rec["clean"] = 0  # malformed header line
                continue
            hdrs.append([name.lower(), value.strip()])
        rec["n_headers"] = len(hdrs)
        for key, val in hdrs:
            if key == b"warc-type":
                rec["warc_type"] = val.decode("utf-8", "replace")
            elif key == b"warc-target-uri":
                rec["target_uri"] = val.decode("utf-8", "replace")
            elif key == b"warc-record-id":
                rec["record_id"] = val.decode("utf-8", "replace")
            elif key == b"warc-date":
                rec["warc_date"] = val.decode("utf-8", "replace")
            elif key == b"content-type":
                rec["content_type"] = val.decode("utf-8", "replace")
            elif key == b"content-length":
                try:
                    content_length = int(val)
                except ValueError:
                    rec["clean"] = 0
        if content_length is None or content_length < 0:
            # can't frame the payload: the record is damaged and the
            # rest of the file is unreachable — stop, don't guess
            rec["clean"] = 0
            records.append(rec)
            break
        rec["content_length"] = content_length
        body = payload[pos : pos + content_length]
        if len(body) < content_length:
            rec["clean"] = 0  # truncated inside the payload
        pos += len(body)
        ct = (rec["content_type"] or "").split(";")[0].strip()
        if ct.startswith("text/") or ct in (
            "application/json",  # WAT metadata records
            "application/warc-fields",  # warcinfo key:value text
        ):
            rec["text"] = body.decode("utf-8", "replace")
        elif ct == "application/http":
            # raw WARC response/request record: the payload is the
            # full HTTP message (the bulk of a Common Crawl drop)
            status, hct, entity, hclean = _http_response_meta(body)
            rec["http_status"] = status
            rec["http_content_type"] = hct
            if not hclean:
                rec["clean"] = 0
            hbase = (hct or "").split(";")[0].strip()
            if entity is not None and (
                hbase.startswith("text/") or hbase == "application/json"
            ):
                rec["text"] = entity.decode("utf-8", "replace")
        if payload[pos : pos + 4] == _CRLF + _CRLF:
            pos += 4
        elif len(body) == content_length:
            rec["clean"] = 0  # full payload but missing terminator
        records.append(rec)
    return records


def encode_warc(
    records: "Iterable[dict]",
    *,
    gzip_members: bool = False,
    truncate_last_payload_at: "int | None" = None,
    trailing_garbage: bytes = b"",
) -> bytes:
    """Inverse fixture generator (x146-x150's pattern): build a WARC
    byte stream whose ``warc_records`` walk returns exactly the
    arguments. Each record dict takes ``warc_type``, ``body``
    (bytes or str), and optional ``target_uri`` / ``record_id`` /
    ``warc_date`` / ``content_type``. ``gzip_members`` wraps each
    record as its own gzip member (the .warc.gz wire layout),
    deterministically (zlib, no timestamp).
    ``truncate_last_payload_at`` cuts the LAST record's payload that
    many bytes in and drops its terminator (a download cut mid-
    record); ``trailing_garbage`` appends non-WARC bytes after the
    final record (both are uncompressed-layout damage knobs)."""
    recs = list(records)
    pieces: list[bytes] = []
    for i, r in enumerate(recs):
        r = dict(r)
        if "http" in r:
            # build a raw response record: payload = full HTTP message
            h = r["http"]
            entity = h.get("body", b"")
            if isinstance(entity, str):
                entity = entity.encode("utf-8")
            enc_hdr = b""
            if h.get("gzip"):
                obj = zlib.compressobj(6, zlib.DEFLATED, 31)
                entity = obj.compress(entity) + obj.flush()
                enc_hdr = b"Content-Encoding: gzip\r\n"
            status_line = (
                f"HTTP/1.1 {h.get('status', 200)} {h.get('reason', 'OK')}"
            )
            ct_line = f"Content-Type: {h.get('content_type', 'text/html')}"
            r["body"] = (
                status_line.encode("utf-8") + _CRLF
                + ct_line.encode("utf-8") + _CRLF
                + enc_hdr + _CRLF + entity
            )
            r.setdefault(
                "content_type", "application/http; msgtype=response"
            )
        body = r.get("body", b"")
        if isinstance(body, str):
            body = body.encode("utf-8")
        headers = [("WARC-Type", r.get("warc_type", "conversion"))]
        for key, field in (
            ("WARC-Record-ID", "record_id"),
            ("WARC-Date", "warc_date"),
            ("WARC-Target-URI", "target_uri"),
            ("Content-Type", "content_type"),
        ):
            if r.get(field) is not None:
                headers.append((key, r[field]))
        headers.append(("Content-Length", str(len(body))))
        rec = b"WARC/1.0\r\n"
        rec += b"".join(
            f"{k}: {v}".encode("utf-8") + _CRLF for k, v in headers
        )
        rec += _CRLF
        if i == len(recs) - 1 and truncate_last_payload_at is not None:
            rec += body[:truncate_last_payload_at]
        else:
            rec += body + _CRLF + _CRLF
        pieces.append(rec)
    if gzip_members:
        out = bytearray()
        for rec in pieces:
            obj = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += obj.compress(rec) + obj.flush()
        return bytes(out)
    return b"".join(pieces) + trailing_garbage


def extract_warc_records(
    media_df: "DataFrame",
    id_col: str = "media_id",
    payload_col: str = "payload",
    *,
    strict: bool = True,
) -> "DataFrame":
    """mapInPandas WARC record explosion — the 100 TB shape of the
    x146-x150 extract wrappers, except one payload yields MANY rows
    (a WARC file is a container): Arrow-batched byte-walk in the
    SCAN stage, no shuffle, id name/type preserved and repeated per
    record; ``strict=False`` contains non-WARC blobs as a single
    NULL row + ``parse_error``."""
    import pandas as pd  # noqa: F401 (kernel-side)

    id_type = dict(media_df.dtypes)[id_col]
    cols = list(_WARC_COLS)
    if not strict:
        cols.append(("parse_error", "string"))
    schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"{n} {t}" for n, t in cols]
    )

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            out_ids: list = []
            metas: list[dict] = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows = warc_records(b)
                except ValueError as e:
                    if strict:
                        raise
                    rows = [{"parse_error": str(e)}]
                for r in rows:
                    out_ids.append(mid)
                    metas.append(r)
            out = {id_col: pd.Series(out_ids)}
            for name, _t in cols:
                out[name] = pd.Series(
                    [m.get(name) for m in metas], dtype="object"
                )
            yield pd.DataFrame(out)

    return media_df.mapInPandas(kernel, schema)


def read_warc(
    spark: "SparkSession",
    path: str,
    *,
    strict: bool = False,
) -> "DataFrame":
    """Read WARC/WET files (plain or .warc.gz member-concatenated)
    into one row per record: ``binaryFile`` scan → record explosion.
    The scan parallelizes per FILE (Common Crawl's unit: ~1 GB
    segments, tens of thousands per crawl), each task walking its
    file's records inside the scan stage — no shuffle, and column
    pruning upstream of the walk is irrelevant because the walk IS
    the scan. Defaults to ``strict=False``: real crawls contain
    damaged members, and an audit row beats a dead executor."""
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)
    return extract_warc_records(
        files.select(
            F.col("path").alias("media_id"), F.col("content").alias("payload")
        ),
        strict=strict,
    )
