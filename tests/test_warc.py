"""WARC shard ingest (sources/warc.py): framing, gzip members, HTTP
parsing, charset recovery, and the shard→extract→normalize end-to-end —
the Common-Crawl stage −1 in front of the web-pipeline text battery."""

from __future__ import annotations

import gzip

import pytest

from etl_adsbx_spark.sources.warc import (
    gunzip_members,
    iter_warc_records,
    parse_http_response,
    read_warc,
    responses_as_text,
    warc_response_record,
)


def _warcinfo() -> bytes:
    block = b"software: etl-adsbx-spark-tests\r\n"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Record-ID: <urn:uuid:000000000000>\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("ascii")
    return head + block + b"\r\n\r\n"


def _request(uri: str) -> bytes:
    block = f"GET {uri} HTTP/1.1\r\nHost: corpus.local\r\n\r\n".encode("ascii")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: request\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Type: application/http; msgtype=request\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("ascii")
    return head + block + b"\r\n\r\n"


BODY_A = "<html><body><p>hello &amp; welcome</p></body></html>".encode()
# multibyte payload: Content-Length is a BYTE count, not a char count
BODY_B = "<html><body><p>héllo — ﬁn</p></body></html>".encode()


def _shard() -> bytes:
    return (
        _warcinfo()
        + _request("http://corpus.local/a")
        + warc_response_record(
            "http://corpus.local/a", "2026-01-01T00:00:00Z", BODY_A,
            content_type="text/html; charset=utf-8",
        )
        + warc_response_record(
            "http://corpus.local/b", "2026-01-02T00:00:00Z", BODY_B,
            content_type="text/html; charset=utf-8",
        )
    )


def test_iter_warc_records_framing():
    recs = list(iter_warc_records(_shard()))
    assert [h["warc-type"] for _, h, _ in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    # blocks are exactly Content-Length bytes
    for _, h, block in recs:
        assert len(block) == int(h["content-length"])
    status, ctype, body, payload_ok = parse_http_response(recs[3][2])
    assert (status, ctype, payload_ok) == (200, "text/html; charset=utf-8", 1)
    assert body == BODY_B  # byte-exact multibyte payload recovery


def test_gzip_member_stream_roundtrip():
    """.warc.gz = CONCATENATED per-record gzip members (the Common Crawl
    convention); the decompressor must consume every member."""
    records = [_warcinfo(), _request("http://corpus.local/a"),
               warc_response_record("http://corpus.local/a",
                                    "2026-01-01T00:00:00Z", BODY_A)]
    gz = b"".join(gzip.compress(r) for r in records)
    assert gunzip_members(gz) == b"".join(records)
    assert len(list(iter_warc_records(gz))) == 3  # auto-detected via magic


def test_truncated_shard_fails_loudly():
    shard = _shard()
    with pytest.raises(ValueError, match="overruns"):
        list(iter_warc_records(shard[: len(shard) - 30]))
    with pytest.raises(ValueError, match="version"):
        list(iter_warc_records(b"NOT-A-WARC\r\n\r\n"))


def test_read_warc_and_responses_as_text(spark, tmp_path):
    plain = tmp_path / "w"
    plain.mkdir()
    (plain / "shard-000.warc").write_bytes(_shard())
    (plain / "shard-001.warc.gz").write_bytes(
        gzip.compress(
            warc_response_record(
                "http://corpus.local/c", "2026-01-03T00:00:00Z",
                "<html><body><p>third</p></body></html>".encode(),
                content_type="text/html; charset=utf-8",
            )
        )
    )
    records = read_warc(spark, str(plain))
    rows = {
        (r["warc_type"], r["target_uri"]): r for r in records.collect()
    }
    assert len(rows) == 5
    resp_a = rows[("response", "http://corpus.local/a")]
    assert resp_a["http_status"] == 200
    assert bytes(resp_a["body"]) == BODY_A
    # non-HTTP records keep their raw block + WARC content-type
    info = rows[("warcinfo", None)]
    assert info["http_status"] is None
    assert info["content_type"] == "application/warc-fields"
    assert bytes(info["body"]).startswith(b"software:")

    text = responses_as_text(records)
    trows = {r["url"]: r for r in text.collect()}
    # request records and non-200s are gone; bodies decoded as UTF-8
    assert set(trows) == {
        "http://corpus.local/a", "http://corpus.local/b",
        "http://corpus.local/c",
    }
    assert "héllo — ﬁn" in trows["http://corpus.local/b"]["raw_html"]
    assert trows["http://corpus.local/c"]["fetched_at"] is not None


def test_warc_to_text_battery_end_to_end(spark, tmp_path):
    """Stage −1 → stage 0: shard on disk → read_warc → responses_as_text
    → the fused extract_and_normalize kernel. The multibyte page's
    ligature must be NFKC-folded by the normalize half."""
    from etl_adsbx_spark.functions.normalize import extract_and_normalize

    d = tmp_path / "w"
    d.mkdir()
    (d / "s.warc").write_bytes(_shard())
    pages = responses_as_text(read_warc(spark, str(d)))
    out = extract_and_normalize(pages, html_col="raw_html", out_col="text")
    texts = {r["url"]: r["text"] for r in out.collect()}
    assert texts["http://corpus.local/a"] == "hello & welcome"
    assert texts["http://corpus.local/b"] == "héllo — fin"  # ﬁ → fi


def test_decode_body_unit():
    """decode_body's sniff order: BOM > header charset > HTML5 meta
    prescan > UTF-8, strict-first with a FLAGGED replacement terminal."""
    from etl_adsbx_spark.sources.warc import decode_body

    # header charset, byte-exact legacy recovery
    latin = "café idée nº 7"
    assert decode_body(latin.encode("iso-8859-1"),
                       "text/plain; charset=ISO-8859-1") == (latin, "iso8859-1", 1)
    sjis = "こんにちは世界"
    assert decode_body(sjis.encode("shift_jis"),
                       "text/html; charset=Shift_JIS") == (sjis, "shift_jis", 1)
    # meta prescan (html, no header param), quoted and bare forms
    html = '<html><head><meta charset="windows-1252"></head><body>café</body></html>'
    assert decode_body(html.encode("cp1252"), "text/html") == (html, "cp1252", 1)
    html2 = ('<html><head><meta http-equiv="Content-Type" '
             'content="text/html; charset=iso-8859-1"></head><body>nº</body></html>')
    assert decode_body(html2.encode("iso-8859-1"), "text/html") == (html2, "iso8859-1", 1)
    # BOM wins over a (wrong) declared label and is consumed
    bom = "﻿bom text".encode("utf-8")
    assert decode_body(bom, "text/plain; charset=iso-8859-1") == ("bom text", "utf-8-sig", 1)
    assert decode_body("utf16 text".encode("utf-16"), None) == ("utf16 text", "utf-16", 1)
    # unknown label falls through to a clean UTF-8 decode (still ok=1)
    assert decode_body(b"plain ascii", "text/plain; charset=x-nope-999") == (
        "plain ascii", "utf-8", 1)
    # declared utf-8 but invalid bytes: terminal replace, FLAGGED
    text, cs, ok = decode_body(b"caf\xe9", "text/plain; charset=utf-8")
    assert (text, cs, ok) == ("caf�", "utf-8", 0)
    # declared charset that raises ValueError mid-decode (utf-7 oddity) is survivable
    assert decode_body(b"", None) == ("", "utf-8", 1)
    # bogus HEADER label over a valid meta-declared HTML page: the prescan
    # is a fallback candidate (WHATWG falls through when the label doesn't
    # resolve), so the page RECOVERS instead of mangle-and-flag
    html3 = '<html><head><meta charset="shift_jis"></head><body>日本語</body></html>'
    assert decode_body(html3.encode("shift_jis"),
                       "text/html; charset=x-bogus-999") == (html3, "shift_jis", 1)
    # BOM followed by a damaged stream: stay with the BOM codec, replace + FLAG
    text, cs, ok = decode_body(b"\xef\xbb\xbfcaf\xe9", None)
    assert (cs, ok) == ("utf-8-sig", 0) and text == "caf�"
    text, cs, ok = decode_body(b"\xff\xfeab\x00", None)  # truncated UTF-16 unit
    assert (cs, ok) == ("utf-16", 0)


def test_responses_as_text_charset_aware(spark, tmp_path):
    """Stage −1 with legacy-encoded pages: latin-1 and shift_jis bodies
    recover byte-exactly (re-encoding the decoded text under the declared
    charset reproduces the original payload bytes), a mangled page is
    flagged decode_ok=0, and the charset_aware=False fast path keeps the
    old cast semantics."""
    latin = "café idée nº 7"
    sjis = "<html><body>こんにちは世界</body></html>"
    d = tmp_path / "w"
    d.mkdir()
    shard = (
        warc_response_record(
            "http://corpus.local/latin", "2026-01-01T00:00:00Z",
            latin.encode("iso-8859-1"),
            content_type="text/plain; charset=ISO-8859-1",
        )
        + warc_response_record(
            "http://corpus.local/sjis", "2026-01-01T00:00:00Z",
            sjis.encode("shift_jis"),
            content_type="text/html; charset=Shift_JIS",
        )
        + warc_response_record(
            "http://corpus.local/bad", "2026-01-01T00:00:00Z",
            b"caf\xe9 mangled",
            content_type="text/plain; charset=utf-8",
        )
    )
    (d / "s.warc").write_bytes(shard)
    out = {r["url"]: r for r in responses_as_text(read_warc(spark, str(d))).collect()}
    assert out["http://corpus.local/latin"]["raw_html"] == latin
    assert out["http://corpus.local/latin"]["charset"] == "iso8859-1"
    assert out["http://corpus.local/latin"]["raw_html"].encode("iso8859-1") == latin.encode("iso-8859-1")
    assert out["http://corpus.local/sjis"]["raw_html"] == sjis
    assert out["http://corpus.local/sjis"]["charset"] == "shift_jis"
    assert out["http://corpus.local/sjis"]["raw_html"].encode("shift_jis") == sjis.encode("shift_jis")
    assert all(out[u]["decode_ok"] == 1 for u in
               ("http://corpus.local/latin", "http://corpus.local/sjis"))
    bad = out["http://corpus.local/bad"]
    assert bad["decode_ok"] == 0 and "�" in bad["raw_html"]
    # fast path: UTF-8 cast semantics, decode_ok unclaimed (NULL)
    fast = {r["url"]: r for r in
            responses_as_text(read_warc(spark, str(d)), charset_aware=False).collect()}
    assert "�" in fast["http://corpus.local/latin"]["raw_html"]
    assert fast["http://corpus.local/latin"]["decode_ok"] is None


def test_decode_payload_unit():
    """The HTTP payload layer (the decode_ok discipline one level down):
    chunked framing, gzip/deflate (both wrapper forms), layered
    transfer+content codings, and every damage class FLAGGED
    (payload_ok=0) with best-effort bytes — never silent, never fatal."""
    import zlib

    from etl_adsbx_spark.sources.warc import dechunk, decode_payload

    body = "héllo payload — ﬁn".encode()

    # chunked: multi-chunk, extensions ignored, trailers dropped
    framed = (b"5;ext=1\r\n" + body[:5] + b"\r\n"
              + format(len(body) - 5, "x").encode() + b"\r\n" + body[5:]
              + b"\r\n0\r\nX-Trailer: v\r\n\r\n")
    assert dechunk(framed) == (body, 1)
    # truncated: missing terminal chunk → data recovered, FLAGGED
    assert dechunk(b"5\r\nabcde\r\n") == (b"abcde", 0)
    # truncated mid-chunk-data
    assert dechunk(b"a\r\nabc") == (b"abc", 0)
    # corrupt size line
    assert dechunk(b"zz\r\nabc\r\n0\r\n\r\n") == (b"", 0)

    # gzip (real compressor output decodes, not just stored blocks)
    assert decode_payload(gzip.compress(body), None, "gzip") == (body, 1)
    assert decode_payload(gzip.compress(body), None, "x-gzip") == (body, 1)
    # deflate: zlib-wrapped AND raw (the historical server ambiguity)
    assert decode_payload(zlib.compress(body), None, "deflate") == (body, 1)
    co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    raw = co.compress(body) + co.flush()
    assert decode_payload(raw, None, "deflate") == (body, 1)
    # layered: chunked transfer of a gzip entity
    gz = gzip.compress(body)
    framed = format(len(gz), "x").encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    assert decode_payload(framed, "chunked", "gzip") == (body, 1)
    # truncated gzip: full plaintext recovered but no end marker → FLAG
    out, ok = decode_payload(gzip.compress(body)[:-8], None, "gzip")
    assert (out, ok) == (body, 0)
    # corrupt gzip: raw bytes back, FLAGGED
    out, ok = decode_payload(b"\x1f\x8b" + b"junkjunk", None, "gzip")
    assert ok == 0
    # unsupported codings: raw bytes, FLAGGED
    assert decode_payload(body, None, "br") == (body, 0)
    assert decode_payload(body, "gzip, chunked", None) == (body, 0)
    # identity / absent: untouched
    assert decode_payload(body, None, None) == (body, 1)
    assert decode_payload(body, "identity", "identity") == (body, 1)


def test_parse_http_response_payload_layers():
    """parse_http_response undoes Transfer-Encoding: chunked and
    Content-Encoding: gzip/deflate before the charset decoder sees the
    bytes; damage flags payload_ok=0."""
    from etl_adsbx_spark.sources.warc import parse_http_response

    body = "compressed ¡page!".encode()
    gz = gzip.compress(body)
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n"
             b"Content-Encoding: gzip\r\nContent-Length: "
             + str(len(gz)).encode() + b"\r\n\r\n" + gz)
    assert parse_http_response(block) == (
        200, "text/plain; charset=utf-8", body, 1)

    framed = format(len(gz), "x").encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
             b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n"
             + framed)
    assert parse_http_response(block) == (200, "text/plain", body, 1)

    # truncated chunked stream: flagged, best-effort bytes
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
             b"Transfer-Encoding: chunked\r\n\r\n5\r\nabcde\r\n")
    assert parse_http_response(block) == (200, "text/plain", b"abcde", 0)


def test_codegen_compressed_constructions(spark):
    """The in-plan construction helpers emit REAL decodable streams:
    gzip_stored_col/deflate_raw_stored_col/chunked_body_col bytes decode
    through stdlib zlib / the dechunk kernel to the original payload,
    and their sizes match the documented len+23 / len+5 / len+hex+9
    formulas the oracles rely on."""
    import zlib

    from pyspark.sql import functions as F

    from etl_adsbx_spark.sources.warc import (
        chunked_body_col,
        dechunk,
        deflate_raw_stored_col,
        gzip_stored_col,
    )

    df = spark.createDataFrame(
        [("héllo — ﬁn",), ("x",), ("",)], "t string"
    ).select(
        F.encode("t", "UTF-8").alias("b"),
        gzip_stored_col(F.encode("t", "UTF-8")).alias("gz"),
        gzip_stored_col(F.encode("t", "UTF-8"), include_trailer=False).alias("gz_t"),
        deflate_raw_stored_col(F.encode("t", "UTF-8")).alias("df"),
        chunked_body_col(F.encode("t", "UTF-8")).alias("ch"),
        chunked_body_col(F.encode("t", "UTF-8"), terminated=False).alias("ch_t"),
    )
    for r in df.collect():
        body = bytes(r["b"])
        gz, df_raw, ch = bytes(r["gz"]), bytes(r["df"]), bytes(r["ch"])
        assert len(gz) == len(body) + 23
        assert len(df_raw) == len(body) + 5
        assert len(ch) == len(body) + len(format(len(body), "X")) + 9
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        assert d.decompress(gz) + d.flush() == body and d.eof
        d = zlib.decompressobj(-zlib.MAX_WBITS)
        assert d.decompress(df_raw) + d.flush() == body and d.eof
        assert dechunk(ch) == (body, 1)
        # the truncation variants recover the payload but flag it
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        assert d.decompress(bytes(r["gz_t"])) + d.flush() == body
        assert not d.eof
        # empty payload: its lone "0-size" chunk IS a terminal chunk, so
        # the truncated variant degenerates to a valid empty stream
        assert dechunk(bytes(r["ch_t"])) == (body, 0 if body else 1)
