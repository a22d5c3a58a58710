"""WARC (Web ARChive) shard ingest — stage −1 of the web-corpus pipeline.

Common-Crawl-shaped corpora arrive as directories of ``.warc`` /
``.warc.gz`` shards: a flat sequence of WARC/1.x records (warcinfo,
request, response, …) where a **response** record's block is a raw HTTP
response — status line, headers, blank line, body. This source turns
those shards into rows that feed ``functions.html.extract_and_normalize``
and the text battery (the engine's stage 0).

Scale contract (the ``webdataset.py`` design point):

- **One task per shard.** Shards are read with Spark's ``binaryFile``
  source (one row per archive), so shard bytes move straight from storage
  to the executor that parses them — the driver never holds payloads, and
  parallelism = shard count (Common Crawl ships ~1 GB shards; 100 TB ≈
  100k shards ≈ 100k tasks, a normal stage).
- **Record parsing is a mapInPandas kernel** over the shard bytes —
  stdlib only (``zlib`` for the per-member gzip framing, byte slicing for
  the WARC framing; WARC is a length-prefixed flat format, so parsing is
  one linear scan, no codec work).
- Deterministic: record order follows the shard; ``record_id`` is the
  archive's own ``WARC-Record-ID`` header, not an invented id.

Format notes (ISO 28500, all handled): records are framed as a version
line ``WARC/1.0``, CRLF header lines, a blank line, exactly
``Content-Length`` block bytes, then a CRLF CRLF separator; ``.warc.gz``
shards are CONCATENATED per-record gzip members (the Common Crawl
convention — decompressed as a multi-member stream).
"""

from __future__ import annotations

import codecs
import os
import re
import zlib
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
)

RECORD_SCHEMA = StructType(
    [
        StructField("shard", StringType(), False),
        StructField("record_id", StringType(), True),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_length", LongType(), False),
        StructField("body", BinaryType(), True),
        # 1 = HTTP payload framing/compression fully decoded (or none
        # present); 0 = chunked framing damage, truncated/corrupt
        # deflate stream, or an unsupported Content-Encoding — the body
        # carries the best-effort bytes, FLAGGED (the decode_ok
        # discipline one layer down the HTTP stack); NULL for records
        # that are not HTTP-framed
        StructField("payload_ok", IntegerType(), True),
    ]
)


def gunzip_members(blob: bytes) -> bytes:
    """Decompress a stream of CONCATENATED gzip members (the ``.warc.gz``
    framing: one member per record) into one flat byte string."""
    out = []
    while blob:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(blob))
        out.append(d.flush())
        blob = d.unused_data
    return b"".join(out)


def iter_warc_records(blob: bytes) -> Iterator[tuple[str, dict[str, str], bytes]]:
    """Linear scan over a (decompressed) WARC shard: yields
    ``(version, headers, block)`` per record. Header names are
    lower-cased (WARC headers are case-insensitive); the block is exactly
    ``Content-Length`` bytes. Raises ``ValueError`` on framing damage —
    a truncated shard should fail loudly, not silently drop records."""
    if blob[:2] == b"\x1f\x8b":
        blob = gunzip_members(blob)
    pos, n = 0, len(blob)
    while pos < n:
        while blob[pos : pos + 2] == b"\r\n":  # inter-record CRLF CRLF
            pos += 2
        if pos >= n:
            break
        eol = blob.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError(f"truncated WARC version line at offset {pos}")
        version = blob[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad WARC version line at offset {pos}: {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = blob.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError(f"truncated WARC header block at offset {pos}")
            line = blob[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, _, value = line.decode("utf-8", "replace").partition(":")
            headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"record at offset {pos} missing/invalid Content-Length header"
            ) from None
        if pos + clen > n:
            raise ValueError(f"record at offset {pos} overruns shard ({clen} bytes)")
        yield version, headers, blob[pos : pos + clen]
        pos += clen


def dechunk(body: bytes) -> tuple[bytes, int]:
    """Decode ``Transfer-Encoding: chunked`` framing → ``(payload, ok)``:
    hex size line (chunk extensions after ``;`` ignored), CRLF, exactly
    that many data bytes, CRLF, …, terminated by a 0-size chunk
    (trailers, if any, are framing only and dropped). A truncated or
    corrupt stream returns the bytes decoded SO FAR with ``ok=0`` —
    damage is flagged, never silent and never fatal to the shard."""
    out: list[bytes] = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return b"".join(out), 0  # truncated size line
        line = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(line, 16)
        except ValueError:
            return b"".join(out), 0  # corrupt size line
        pos = eol + 2
        if size == 0:
            return b"".join(out), 1  # terminal chunk: framing complete
        chunk = body[pos : pos + size]
        out.append(chunk)
        if len(chunk) < size:
            return b"".join(out), 0  # truncated chunk data
        pos += size
        if body[pos : pos + 2] != b"\r\n":
            return b"".join(out), 0  # missing chunk-data CRLF
        pos += 2


def _inflate_one(body: bytes, coding: str) -> tuple[bytes, int]:
    if coding in ("gzip", "x-gzip"):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    elif coding == "deflate":
        # the historical deflate ambiguity: servers send both the
        # zlib-wrapped form RFC 9110 means and raw DEFLATE — sniff by
        # attempting the wrapper first, falling back to raw
        try:
            d = zlib.decompressobj()
            out = d.decompress(body) + d.flush()
            return out, int(d.eof)
        except zlib.error:
            d = zlib.decompressobj(-zlib.MAX_WBITS)
    else:
        return body, 0  # unsupported coding (br, zstd, …): raw, flagged
    try:
        out = d.decompress(body) + d.flush()
    except zlib.error:
        return body, 0  # corrupt stream: raw bytes, flagged
    # a stream that never reached its end marker is TRUNCATED: partial
    # plaintext, flagged (d.eof distinguishes it from a clean finish)
    return out, int(d.eof)


def decode_payload(
    body: bytes, transfer_encoding: str | None, content_encoding: str | None
) -> tuple[bytes, int]:
    """Undo the HTTP payload layers in protocol order →
    ``(payload, payload_ok)``: Transfer-Encoding first (``chunked``
    removes the framing; RFC 9112 requires chunked to be the final
    transfer coding), then each Content-Encoding coding right-to-left
    (``gzip``/``x-gzip``/``deflate``/``identity`` via stdlib zlib).
    Any damage — truncated chunk, corrupt/truncated deflate stream, an
    unsupported coding — stops the pipeline and returns the
    best-effort bytes with ``payload_ok=0``: the same FLAG discipline
    as ``decode_body``'s ``decode_ok``, one layer down the stack (the
    r10 gap: such payloads reached the charset decoder raw and exited
    as flagged mojibake, losing the page)."""
    ok = 1
    if transfer_encoding:
        codings = [c.strip().lower() for c in transfer_encoding.split(",")]
        codings = [c for c in codings if c and c != "identity"]
        if codings == ["chunked"]:
            body, ok = dechunk(body)
        elif codings:
            return body, 0  # unsupported transfer stack: raw, flagged
        if not ok:
            return body, 0
    if content_encoding:
        codings = [c.strip().lower() for c in content_encoding.split(",")]
        for coding in reversed([c for c in codings if c and c != "identity"]):
            body, ok = _inflate_one(body, coding)
            if not ok:
                return body, 0
    return body, ok


def parse_http_response(
    block: bytes,
) -> tuple[int | None, str | None, bytes, int | None]:
    """Split a response record's block into (status, content-type,
    payload, payload_ok), undoing ``Transfer-Encoding: chunked`` framing
    and ``Content-Encoding: gzip/deflate`` compression (stdlib zlib) so
    the bytes handed to the charset decoder are the actual entity —
    real Common-Crawl response records routinely carry both layers.
    ``payload_ok`` follows ``decode_payload``'s flag contract. Returns
    ``(None, None, block, None)`` when the block is not HTTP-framed
    (e.g. a ``resource`` record) — the caller keeps the raw bytes."""
    if not block.startswith(b"HTTP/"):
        return None, None, block, None
    sep = block.find(b"\r\n\r\n")
    head, body = (block[:sep], block[sep + 4 :]) if sep >= 0 else (block, b"")
    lines = head.split(b"\r\n")
    parts = lines[0].decode("ascii", "replace").split()
    status = int(parts[1]) if len(parts) >= 2 and parts[1].isdigit() else None
    ctype = t_enc = c_enc = None
    for line in lines[1:]:
        name, _, value = line.decode("utf-8", "replace").partition(":")
        name = name.strip().lower()
        if name == "content-type" and ctype is None:
            ctype = value.strip()
        elif name == "transfer-encoding" and t_enc is None:
            t_enc = value.strip()
        elif name == "content-encoding" and c_enc is None:
            c_enc = value.strip()
    payload, payload_ok = decode_payload(body, t_enc, c_enc)
    return status, ctype, payload, payload_ok


_CHARSET_PARAM = re.compile(r"""charset\s*=\s*["']?\s*([A-Za-z0-9_.:+-]+)""", re.I)
# HTML5 prescan (first 1024 bytes, ASCII-compatible by spec): both the
# <meta charset=...> shorthand and the http-equiv Content-Type form.
_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:+-]+)""", re.I
)
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32"),  # before UTF-16LE (prefix collision)
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)


def decode_body(body: bytes, content_type: str | None) -> tuple[str, str, int]:
    """Charset-aware HTTP body decode → ``(text, charset_used,
    decode_ok)``. Decision order (the WHATWG encoding-sniff order,
    stdlib-codec edition):

    1. **BOM wins** over any declared label (utf-8-sig / utf-16 / utf-32
       — the BOM is consumed, not kept in the text);
    2. the ``charset=`` parameter of the Content-Type header;
    3. for HTML (or untyped) bodies, the HTML5 prescan over the first
       1024 bytes (``<meta charset=…>`` / http-equiv form);
    4. UTF-8.

    The first candidate whose codec exists AND decodes the bytes
    STRICTLY is used (``charset_used`` is the codec's canonical Python
    name, e.g. ``ISO-8859-1`` → ``iso8859-1``) with ``decode_ok=1``;
    if none decodes cleanly the terminal fallback is UTF-8 with U+FFFD
    replacement and ``decode_ok=0`` — mangling is FLAGGED, never silent
    (the r9 gap: legacy-encoded pages were force-decoded as UTF-8 with
    no signal). Divergence from WHATWG kept deliberately: labels map to
    Python's stdlib codecs verbatim (no ISO-8859-1→windows-1252 remap),
    so a correctly-labelled page round-trips byte-exactly."""
    for bom, name in _BOMS:
        if body.startswith(bom):
            try:
                return body.decode(name), name, 1
            except (UnicodeDecodeError, ValueError):
                # BOM present but the stream is damaged (truncated UTF-16/32
                # unit, invalid UTF-8 after a UTF-8 BOM): stay with the
                # BOM's codec — falling through to UTF-8 would render the
                # BOM itself as garbage — replace and FLAG
                return body.decode(name, "replace"), name, 0
    candidates: list[str] = []
    if content_type:
        m = _CHARSET_PARAM.search(content_type)
        if m:
            candidates.append(m.group(1))
    # the meta prescan is a FALLBACK candidate even when the header
    # carries a charset param: WHATWG falls through when the header label
    # does not resolve, and a bogus header label over a valid
    # <meta charset> page must recover, not mangle-and-flag
    if not content_type or "html" in content_type.lower():
        m = _META_CHARSET.search(body[:1024])
        if m:
            candidates.append(m.group(1).decode("ascii", "replace"))
    candidates.append("utf-8")
    for label in candidates:
        try:
            codec = codecs.lookup(label)
        except LookupError:
            continue
        try:
            return body.decode(codec.name), codec.name, 1
        except (UnicodeDecodeError, ValueError):
            continue
    return body.decode("utf-8", "replace"), "utf-8", 0


def decoded_text_col(body_col: str, ctype_col: str):
    """Column-level charset-aware decode: a struct-returning Arrow-batched
    pandas UDF over (body, content_type) → struct(text, charset,
    decode_ok). One projection, map-only — composes into any plan
    (``responses_as_text``, the graded ``warc_roundtrip`` decode leg)."""
    import pyspark.sql.pandas.functions as pf

    @pf.pandas_udf("struct<text:string, charset:string, decode_ok:int>")
    def _decode(body: pd.Series, ctype: pd.Series) -> pd.DataFrame:
        rows = [
            decode_body(bytes(b) if b is not None else b"", c)
            for b, c in zip(body, ctype)
        ]
        return pd.DataFrame(rows, columns=["text", "charset", "decode_ok"])

    return _decode(F.col(body_col), F.col(ctype_col))


def _record_rows(shard: str, blob: bytes, rows: dict[str, list]) -> None:
    for _version, hdr, block in iter_warc_records(blob):
        wtype = hdr.get("warc-type")
        if wtype in ("response", "request"):
            status, ctype, body, payload_ok = parse_http_response(block)
        else:
            status, ctype, body, payload_ok = None, hdr.get("content-type"), block, None
        rows["shard"].append(shard)
        rows["record_id"].append(hdr.get("warc-record-id"))
        rows["warc_type"].append(wtype)
        rows["target_uri"].append(hdr.get("warc-target-uri"))
        rows["warc_date"].append(hdr.get("warc-date"))
        rows["http_status"].append(status)
        rows["content_type"].append(ctype)
        rows["content_length"].append(len(block))
        rows["body"].append(body)
        rows["payload_ok"].append(payload_ok)


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """WARC shards under ``path`` → one row per record (RECORD_SCHEMA).
    ``http_status``/``content_type``/``body`` are the parsed HTTP fields
    for request/response records and the raw block otherwise."""
    shards = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, glob))
        .select(F.col("path").alias("shard"), F.col("content").alias("_bytes"))
    )

    def expand(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in RECORD_SCHEMA.fields}
            for shard, blob in zip(pdf["shard"], pdf["_bytes"]):
                _record_rows(shard, bytes(blob), rows)
            out = pd.DataFrame(rows)
            out["http_status"] = out["http_status"].astype("Int32")
            out["payload_ok"] = out["payload_ok"].astype("Int32")
            yield out

    return shards.mapInPandas(expand, schema=RECORD_SCHEMA)


def responses_as_text(
    records: DataFrame,
    status: int = 200,
    charset_aware: bool = True,
    keep_cols: tuple[str, ...] = ("shard",),
) -> DataFrame:
    """Keep HTTP ``response`` records with the given status and decode the
    body to text: (shard, record_id, url, fetched_at, raw_html, charset,
    decode_ok, payload_ok) — the input shape of
    ``functions.html.extract_and_normalize``. Map-only. ``payload_ok``
    is the record parser's payload-layer verdict (chunked/gzip/deflate
    decode, see ``decode_payload``), passed through so downstream
    filters can quarantine flagged pages alongside ``decode_ok``.

    ``charset_aware=True`` (default) decodes through ``decode_body`` —
    BOM, Content-Type ``charset=``, HTML5 meta prescan, UTF-8 fallback —
    so legacy-encoded pages (latin-1, shift_jis, cp1252: most of real
    Common Crawl's non-UTF-8 tail) survive intact, and anything that did
    NOT decode cleanly is flagged with ``decode_ok=0`` instead of being
    silently mangled. ``charset_aware=False`` keeps the r8 fast path
    (Spark's binary→string cast: UTF-8 with U+FFFD replacement, pure
    codegen, ``charset``/``decode_ok`` pinned to that contract) for
    corpora known to be UTF-8-clean.

    ``keep_cols`` names the passthrough identity columns — ``("shard",)``
    for the ``read_warc`` shape, or e.g. ``("doc_id",)`` when the input
    came through ``parse_record_bytes``'s id lane."""
    resp = records.where(
        (F.col("warc_type") == "response") & (F.col("http_status") == status)
    )
    base = [
        *[F.col(c) for c in keep_cols],
        F.col("record_id"),
        F.col("target_uri").alias("url"),
        F.to_timestamp("warc_date").alias("fetched_at"),
    ]
    if not charset_aware:
        return resp.select(
            *base,
            F.col("body").cast("string").alias("raw_html"),
            F.lit("utf-8").alias("charset"),
            F.lit(None).cast("int").alias("decode_ok"),
            F.col("payload_ok"),
        )
    return resp.withColumn(
        "_dec", decoded_text_col("body", "content_type")
    ).select(
        *base,
        F.col("_dec.text").alias("raw_html"),
        F.col("_dec.charset").alias("charset"),
        F.col("_dec.decode_ok").alias("decode_ok"),
        F.col("payload_ok"),
    )


def parse_record_bytes(df: DataFrame, rec_col: str, id_col: str) -> DataFrame:
    """Parse a BINARY COLUMN of WARC bytes (one or more records per row)
    into record-shaped rows, passing the bigint ``id_col`` through — the
    entry point the graded ``warc_roundtrip`` row uses, built on the SAME
    ``iter_warc_records``/``parse_http_response`` kernels as the shard
    source, so the driver-graded row exercises the production parser."""
    out_schema = StructType(
        [StructField(id_col, LongType(), True)]
        + [f for f in RECORD_SCHEMA.fields if f.name != "shard"]
    )

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for rid, blob in zip(pdf[id_col], pdf[rec_col]):
                for _version, hdr, block in iter_warc_records(bytes(blob)):
                    wtype = hdr.get("warc-type")
                    if wtype in ("response", "request"):
                        status, ctype, body, payload_ok = parse_http_response(block)
                    else:
                        status, ctype, body, payload_ok = (
                            None, hdr.get("content-type"), block, None,
                        )
                    rows[id_col].append(rid)
                    rows["record_id"].append(hdr.get("warc-record-id"))
                    rows["warc_type"].append(wtype)
                    rows["target_uri"].append(hdr.get("warc-target-uri"))
                    rows["warc_date"].append(hdr.get("warc-date"))
                    rows["http_status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["content_length"].append(len(block))
                    rows["body"].append(body)
                    rows["payload_ok"].append(payload_ok)
            out = pd.DataFrame(rows)
            out["http_status"] = out["http_status"].astype("Int32")
            out["payload_ok"] = out["payload_ok"].astype("Int32")
            yield out

    return df.mapInPandas(parse, schema=out_schema)


def _le_bytes_col(n, width: int):
    """``width``-byte little-endian binary of a non-negative integer
    Column — exact integer ops (shiftright + AND), whole-stage codegen."""
    n = n.cast("bigint")
    return F.concat(*[
        F.unhex(F.lpad(F.hex(F.shiftright(n, 8 * i).bitwiseAND(F.lit(255))), 2, "0"))
        for i in range(width)
    ])


def _stored_block_col(body_bin):
    """One final STORED (uncompressed) DEFLATE block around ``body_bin``
    (RFC 1951 §3.2.4: BFINAL=1/BTYPE=00 byte, LEN, ~LEN little-endian,
    raw bytes) — the trick that makes compressed-payload test fixtures
    constructible in pure codegen: a stored block is a valid DEFLATE
    stream with NO compressor needed, and its size is exactly
    ``len+5``, so oracles can recompute framed byte counts. Payloads
    over the 65535-byte single-block bound fail loudly."""
    nb = F.octet_length(body_bin)
    checked = F.when(
        nb > 65535,
        F.raise_error("stored-block construction supports <= 65535 bytes"),
    ).otherwise(F.lit(b"\x01"))
    return F.concat(checked, _le_bytes_col(nb, 2),
                    _le_bytes_col(F.lit(65535) - nb, 2), body_bin)


def gzip_stored_col(body_bin, include_trailer: bool = True):
    """CODEGEN gzip member of ``body_bin`` (RFC 1952 header, one stored
    DEFLATE block, CRC32 + ISIZE trailer via ``F.crc32``) — a REAL
    decodable gzip stream, size exactly ``len+23``, built without a
    compressor so in-plan constructions stay whole-stage codegen and
    their oracles can replay every byte count.
    ``include_trailer=False`` yields a TRUNCATED stream (ends after the
    block data): zlib recovers the full payload but never sees the end
    marker — the deterministic fixture for the flagged
    ``payload_ok=0`` truncation path."""
    member = F.concat(
        F.lit(bytes.fromhex("1f8b08000000000000ff")),  # MTIME=0, OS=255
        _stored_block_col(body_bin),
    )
    if include_trailer:
        member = F.concat(
            member,
            _le_bytes_col(F.crc32(body_bin), 4),
            _le_bytes_col(F.octet_length(body_bin), 4),
        )
    return member


def deflate_raw_stored_col(body_bin):
    """CODEGEN raw-DEFLATE (no zlib wrapper) stored-block stream — the
    historical ``Content-Encoding: deflate`` server ambiguity's OTHER
    form, exercising the decoder's wrapper-sniff fallback. Size
    exactly ``len+5``."""
    return _stored_block_col(body_bin)


def chunked_body_col(body_bin, terminated: bool = True):
    """CODEGEN ``Transfer-Encoding: chunked`` framing of ``body_bin`` as
    ONE chunk + the terminal 0-chunk: hex size line, CRLF, data, CRLF,
    ``0`` CRLF CRLF. Framed size is ``len + len(hex(len)) + 9`` —
    oracle-computable. ``terminated=False`` drops the terminal chunk
    (framed size ``len + len(hex(len)) + 4``): the deterministic
    truncation fixture — the decoder recovers the data but flags
    ``payload_ok=0``."""
    framed = F.concat(
        F.encode(F.hex(F.octet_length(body_bin)), "UTF-8"),
        F.lit(b"\r\n"),
        body_bin,
        F.lit(b"\r\n"),
    )
    if terminated:
        framed = F.concat(framed, F.lit(b"0\r\n\r\n"))
    return framed


def warc_response_rec_col(uri, ctype, body_bin, extra_headers=None,
                          include_content_length: bool = True):
    """Whole-stage-codegen WARC response-record serializer: COLUMN-level
    ISO-28500 framing (version line, WARC headers, HTTP/1.1 response
    head, exactly Content-Length payload bytes, record separator) for
    queries that construct shards in-plan (warc_roundtrip,
    web_ingest_pipeline). ``ctype`` may be a literal or a per-row
    Column; both Content-Length fields are BYTE counts of the binary
    payload. ``extra_headers`` (str or Column) is raw additional header
    text — full ``Name: value\\r\\n`` lines, e.g.
    ``"Transfer-Encoding: chunked\\r\\n"`` — inserted after
    Content-Type; ``include_content_length=False`` omits the HTTP
    Content-Length header (RFC 9112: a chunked response carries none;
    the WARC Content-Length still frames the block). Returns a BINARY
    column."""
    if isinstance(ctype, str):
        ctype = F.lit(ctype)
    if isinstance(extra_headers, str):
        extra_headers = F.lit(extra_headers)
    nb = F.octet_length(body_bin)
    parts = [
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: "),
        ctype,
        F.lit("\r\n"),
    ]
    if extra_headers is not None:
        parts.append(extra_headers)
    if include_content_length:
        parts += [F.lit("Content-Length: "), nb.cast("string"), F.lit("\r\n")]
    parts.append(F.lit("\r\n"))
    http_head = F.concat(*parts)
    block_len = F.octet_length(http_head) + nb
    head = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:"),
        F.substring(F.md5(uri), 1, 12),
        F.lit(">\r\nWARC-Target-URI: "),
        uri,
        F.lit(
            "\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "Content-Length: "
        ),
        block_len.cast("string"),
        F.lit("\r\n\r\n"),
    )
    return F.concat(
        F.encode(head, "UTF-8"),
        F.encode(http_head, "UTF-8"),
        body_bin,
        F.lit(b"\r\n\r\n"),
    )


def warc_response_record(
    uri: str, date: str, body: bytes, content_type: str = "text/plain; charset=utf-8"
) -> bytes:
    """Serialize ONE response record (test fixtures + the roundtrip
    oracle's expected framing). Content-Length fields are byte counts,
    computed after UTF-8 encoding — the same math the Spark-side codegen
    serializer in ``queries.warc_roundtrip`` does with octet_length."""
    import hashlib

    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    rid = hashlib.md5(uri.encode("utf-8")).hexdigest()[:12]
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return head + http + b"\r\n\r\n"
