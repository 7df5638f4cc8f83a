"""Span micro-format shared by the fixture generator and the parse plan.

A page (reference: raw HTML walked in document order by scalpel) is
encoded per BASELINE.json input_hint as
``spans: array<struct<kind,text,media_ref,offset>>``:

- ``offset``     dense 0-based document order (the order key of the
                 per-row invariant).
- ``kind``       'media' when the span carries a link target
                 (``media_ref`` non-null), else 'text'.
- ``text``       ``role + US + payload`` where US = ``\\x1f`` (unit
                 separator) and ``role`` is the CSS-class analogue the
                 reference's scalpel selectors match on (e.g.
                 ``comment__body`` ≙ ``div.comment__body``,
                 ZeitDe.hs:135). The raw payload keeps the reference's
                 un-normalized text (em-dashes, padding, query
                 strings) so every string transformation the
                 reference performs stays observable in our kernel.
- ``media_ref``  the href/src target for media spans, verbatim
                 (fragments, queries, relative forms preserved).

Span-sequence equality on (kind, text, media_ref, offset) is the
per-row invariant: the parse plan never mutates spans, only derives
new frames from them.
"""

SEP = "\x1f"

# Roles ≙ scalpel selectors (file:line into /root/reference/src/...):
ROLE_COMMENT = "comment"  # article.comment @id        ZeitDe.hs:130,152
ROLE_BODY = "comment__body"  # div.comment__body       ZeitDe.hs:135
ROLE_NAME = "comment-meta__name"  # [a]                ZeitDe.hs:139-147
ROLE_DATE = "comment-meta__date"  # a                  ZeitDe.hs:136-150,165-167
ROLE_ORIGIN = "comment__origin"  # a                   ZeitDe.hs:153
ROLE_CID_INPUT = "comment__cid-input"  # input[name=cid] ZeitDe.hs:155-156
ROLE_REACTION = "comment__reaction"  # @data-fans      ZeitDe.hs:160-163
ROLE_CANONICAL = "link-canonical"  # link[rel=canonical] ZeitDe.hs:200
ROLE_TITLE = "title"  # <title>                        ZeitDe.hs:201
ROLE_DESCRIPTION = "meta-description"  # meta[name=description] ZeitDe.hs:203
ROLE_BYLINE = "byline"  # div.byline span[itemprop=name] ZeitDe.hs:207
ROLE_META_DATE = "meta-date"  # meta[name=date]        ZeitDe.hs:210-211
ROLE_CONTENT_TYPE = "meta-content-type"  # Encoding.hs:16-41
ROLE_JS_LOADER = "js-comment-loader"  # div.js-comment-loader a ZeitDe.hs:312-314
ROLE_PAGER = "pager__page"  # ul.pager__pages li a     ZeitDe.hs:326-329
ROLE_NEXT = "pager__button--next"  # a.pager__button--next ZeitDe.hs:320-323
ROLE_USER_COMMENT = "user-comment__link"  # article.user-comment a ZeitDe.hs:340-347
ROLE_TEASER_LINK = "zon-teaser__link"  # a.zon-teaser-standard__combined-link ZeitDe.hs:226
ROLE_TEASER_TITLE = "zon-teaser__title"  # ZeitDe.hs:227-228
ROLE_TEASER_TEXT = "zon-teaser__text"  # ZeitDe.hs:230-232
ROLE_TEASER_BYLINE = "zon-teaser__byline"  # ZeitDe.hs:234-236
ROLE_TEASER_DATETIME = "zon-teaser__datetime"  # ZeitDe.hs:238-239
ROLE_ANCHOR = "a"  # any <a href>                      Generic.hs:23-60

EMDASH = "—"  # U+2014, the title/date separator (ZeitDe.hs:136-138)
USER_PREFIX = "https://profile.zeit.de/"  # ZeitDe.hs:359


def text_span(role: str, payload: str, offset: int) -> tuple:
    return ("text", f"{role}{SEP}{payload}", None, offset)


def media_span(role: str, payload: str, href: str, offset: int) -> tuple:
    return ("media", f"{role}{SEP}{payload}", href, offset)
