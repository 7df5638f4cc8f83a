"""Byte-level encoding sniff + decode (S2, the byte half).

Mirrors ``decoder`` — /root/reference/src/Network/Scrapetition/
Encoding.hs:16-41: scrape ``<meta http-equiv=Content-Type>`` from the
RAW bytes, split its content attribute on ';', strip spaces, take the
unit starting with ``charset``, read the value after '='; the latin1
alias family maps to a real ISO-8859-1 *decoder*, anything else (and
no meta at all) decodes as UTF-8 (lenient — malformed bytes become
replacement chars, ≙ ``decodeUtf8With`` with a substituting handler).

Everything is native column expressions: the sniff runs over a
latin1 view of the byte prefix (total, byte-transparent — same trick
scalpel uses by scanning ByteString), the decode is a 2-way
``F.decode`` branch. No Python touches the payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Encoding.hs:19-25 — the exact alias set, case-significant like the
# reference's pattern match (plus the lowered 'iso-8859-1' it lists).
LATIN1_ALIASES = (
    "ISO-8859-1", "iso-8859-1", "ISO_8859-1", "latin1",
    "csISOLatin1", "l1", "CP819",
)

# The whole <meta ...> tag carrying http-equiv=Content-Type, wherever
# the attribute sits inside the tag (scalpel's attribute lookup is
# order-independent and quote-agnostic — Encoding.hs:33-36).
_META_TAG_RE = r'(?i)<meta\b[^>]*http-equiv\s*=\s*["\']?content-type["\']?[^>]*>'
# content="..." / content='...' / content=bare — separate patterns so
# each value class has the right terminator set.
_CONTENT_DQ = r'(?i)content\s*=\s*"([^"]*)"'
_CONTENT_SQ = r"(?i)content\s*=\s*'([^']*)'"
_CONTENT_BARE = r'(?i)content\s*=\s*([^\s"\'>]+)'


def sniff_charset(payload: Column) -> Column:
    """The scraped charset token (Encoding.hs:33-41), or NULL when no
    Content-Type meta is present. Byte-transparent: the regex runs on
    a latin1 view of the payload (the WHOLE document, like the
    reference's scalpel scrape — no fixed sniff window), and attribute
    order/quoting inside the meta tag doesn't matter."""
    doc = F.decode(payload, "ISO-8859-1")
    tag = F.regexp_extract(doc, _META_TAG_RE, 0)
    dq = F.regexp_extract(tag, _CONTENT_DQ, 1)
    sq = F.regexp_extract(tag, _CONTENT_SQ, 1)
    bare = F.regexp_extract(tag, _CONTENT_BARE, 1)
    content = F.when(dq != "", dq).when(sq != "", sq).otherwise(bare)
    units = F.transform(
        F.split(content, ";"), lambda u: F.replace(u, F.lit(" "), F.lit(""))
    )
    charset_unit = F.filter(units, lambda u: u.startswith("charset"))
    token = F.element_at(F.split(F.element_at(charset_unit, 1), "="), 2)
    return F.when(
        (F.size(charset_unit) > 0) & (token != ""), token
    )


def charset_name(payload: Column) -> Column:
    """Normalized charset the decoder will use: the latin1 alias
    family collapses to 'ISO-8859-1' (Encoding.hs:19-25), unknown
    tokens pass through (decoded as UTF-8, :26), absent meta defaults
    to 'UTF-8' (:27)."""
    token = sniff_charset(payload)
    return (
        F.when(token.isin(*LATIN1_ALIASES), F.lit("ISO-8859-1"))
        .when(token.isNotNull(), token)
        .otherwise(F.lit("UTF-8"))
    )


def decode_payload(payload: Column) -> Column:
    """Decoded text: real ISO-8859-1 decode for the alias family,
    lenient UTF-8 for everything else — the reference returns a
    *decoder function*, not just a name, and so do we (as a branch).
    The UTF-8 arm is ``make_valid_utf8`` over the raw bytes (Spark
    4's strict ``decode`` would throw on malformed input; the
    reference substitutes, ``T.decodeUtf8With``)."""
    token = sniff_charset(payload)
    return F.when(
        token.isin(*LATIN1_ALIASES), F.decode(payload, "ISO-8859-1")
    ).otherwise(F.make_valid_utf8(payload.cast("string")))
