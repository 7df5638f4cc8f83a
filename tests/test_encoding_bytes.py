"""Byte-level S2 decode (functions/encoding.py) vs the reference's
Encoding.hs semantics, including its own test vectors
(test/Test/Network/Scrapetition/Encoding.hs:16-23)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapetition_spark.functions.encoding import (
    LATIN1_ALIASES,
    charset_name,
    decode_payload,
    sniff_charset,
)

LATIN1_META = (
    b"<html>\n<head><title>Prefettura della Casa Ponitificia</title>"
    b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
    b"<style><!--"
)


def _one(spark, payload: bytes):
    return spark.createDataFrame([(bytearray(payload),)], "payload binary")


def test_sniff_reference_vectors(spark):
    # test_htmlMetaLatin1Meta: the raw token is scraped verbatim
    row = _one(spark, LATIN1_META).select(
        sniff_charset(F.col("payload")).alias("t"),
        charset_name(F.col("payload")).alias("n"),
    ).collect()[0]
    assert row["t"] == "iso-8859-1" and row["n"] == "ISO-8859-1"
    # test_htmlMetaNothing: no meta ⇒ no token, UTF-8 default
    row = _one(spark, b"asdf").select(
        sniff_charset(F.col("payload")).alias("t"),
        charset_name(F.col("payload")).alias("n"),
    ).collect()[0]
    assert row["t"] is None and row["n"] == "UTF-8"


def test_latin1_alias_family_decodes_latin1(spark):
    for alias in LATIN1_ALIASES:
        page = (
            f'<meta http-equiv="Content-Type" '
            f'content="text/html; charset={alias}">'.encode("ascii")
            + "häuser".encode("iso-8859-1")  # 0xE4 is invalid UTF-8
        )
        row = _one(spark, page).select(
            charset_name(F.col("payload")).alias("n"),
            decode_payload(F.col("payload")).alias("text"),
        ).collect()[0]
        assert row["n"] == "ISO-8859-1", alias
        assert row["text"].endswith("häuser"), alias


def test_unknown_charset_passes_through_decodes_utf8(spark):
    page = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1252">'
        + "häuser".encode("utf-8")
    )
    row = _one(spark, page).select(
        sniff_charset(F.col("payload")).alias("t"),
        charset_name(F.col("payload")).alias("n"),
        decode_payload(F.col("payload")).alias("text"),
    ).collect()[0]
    # Encoding.hs:26 — unknown token kept by name, decoded as UTF-8
    assert row["t"] == "windows-1252" and row["n"] == "windows-1252"
    assert row["text"].endswith("häuser")


def test_meta_attribute_order_quotes_and_position(spark):
    """Scalpel's attribute lookup is order-independent, quote-agnostic
    and scans the whole document — so is the sniff (ADVICE r02)."""
    latin_body = "häuser".encode("iso-8859-1")
    cases = [
        # content BEFORE http-equiv
        b'<meta content="text/html; charset=iso-8859-1" '
        b'http-equiv="Content-Type">',
        # single quotes
        b"<meta http-equiv='Content-Type' "
        b"content='text/html; charset=iso-8859-1'>",
        # unquoted content value (no spaces, valid HTML)
        b"<meta http-equiv=Content-Type content=text/html;charset=iso-8859-1>",
        # spaces around '='
        b'<meta http-equiv = "Content-Type" '
        b'content = "text/html; charset=iso-8859-1">',
        # meta tag far beyond any fixed sniff window
        b"<html>" + b"x" * 8192
        + b'<meta http-equiv="Content-Type" '
          b'content="text/html; charset=iso-8859-1">',
    ]
    for page in cases:
        row = _one(spark, page + latin_body).select(
            charset_name(F.col("payload")).alias("n"),
            decode_payload(F.col("payload")).alias("text"),
        ).collect()[0]
        assert row["n"] == "ISO-8859-1", page[:60]
        assert row["text"].endswith("häuser"), page[:60]


def test_utf8_lenient_on_malformed(spark):
    # stray latin1 byte with no meta: UTF-8 decode must not crash
    # (decodeUtf8With substitution semantics — replacement char)
    row = _one(spark, b"abc \xe4 def").select(
        decode_payload(F.col("payload")).alias("text")
    ).collect()[0]
    assert row["text"].startswith("abc ") and row["text"].endswith(" def")
    assert "\xe4" not in row["text"]  # not silently latin1-decoded
