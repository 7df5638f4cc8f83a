"""Deterministic synthetic web fixtures (FIXTURES.md §2, §7).

Three generators:

1. ``golden_page()`` — span rendering of the reference's captured
   test page ``test/examples/zeit.de.article.html`` carrying the
   exact golden extraction vectors of
   test/Test/Network/Scrapetition/Scrapers/ZeitDe.hs (8 comments,
   their ids/parents/names/users/up-votes, the 3+5 ordered
   discovered URLs, the article metadata).
2. ``fixture_site()`` — a small multi-page site (driver-side, tiny)
   whose FIFO and LIFO crawl traces differ; used by the crawl-order
   tests against the pure-Python reference simulator.
3. ``synthetic_web()`` — a *distributed* spark.range-based generator
   (no driver-side loops) producing millions of interleaved-span
   pages with zipfian hot-host skew; the benchmark frontier.

Everything is seed-deterministic; no external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scrapetition_spark.schemas import DOCUMENTS
from scrapetition_spark.spans import (
    EMDASH,
    ROLE_ANCHOR,
    ROLE_BODY,
    ROLE_BYLINE,
    ROLE_CANONICAL,
    ROLE_CID_INPUT,
    ROLE_COMMENT,
    ROLE_CONTENT_TYPE,
    ROLE_DATE,
    ROLE_DESCRIPTION,
    ROLE_JS_LOADER,
    ROLE_META_DATE,
    ROLE_NAME,
    ROLE_NEXT,
    ROLE_ORIGIN,
    ROLE_PAGER,
    ROLE_REACTION,
    ROLE_TEASER_BYLINE,
    ROLE_TEASER_DATETIME,
    ROLE_TEASER_LINK,
    ROLE_TEASER_TEXT,
    ROLE_TEASER_TITLE,
    ROLE_TITLE,
    ROLE_USER_COMMENT,
    USER_PREFIX,
    media_span,
    text_span,
)

GOLDEN_URL = (
    "https://www.zeit.de/arbeit/2019-10/diskriminierung-beruf-"
    "transsexualitaet-bewerbung-ansprache/komplettansicht"
)
GOLDEN_ARTICLE = (
    "https://www.zeit.de/arbeit/2019-10/diskriminierung-beruf-"
    "transsexualitaet-bewerbung-ansprache"
)

# Golden comment vectors, verbatim from test/.../Scrapers/ZeitDe.hs:21-74.
# (id, parent_or_None, parent_via: 'origin'|'cid'|None, name, user, up_votes)
GOLDEN_COMMENTS = [
    ("cid-50377101", None, None, "regelus", "3096219", 127),
    ("cid-50381108", "cid-50377101", "origin", "FnordPrefect", "5786217", 1),
    ("cid-50377129", None, None, "betreb", "2831850", 166),
    ("cid-50377209", "cid-50377129", "cid", "1 Gehirnlein", None, 9),
    ("cid-50377144", None, None, "Wichtiger Hinweis", "5119426", 23),
    ("cid-50377186", "cid-50377144", "origin", "The Council", None, 260),
    ("cid-50377152", None, None, "centenarium_kid", None, 52),
    ("cid-50377368", "cid-50377152", "cid", "teek", "2777961", 11),
]

GOLDEN_JS_LOADER = [
    f"{GOLDEN_ARTICLE}?cid=50377209",
    f"{GOLDEN_ARTICLE}?cid=50377186",
    f"{GOLDEN_ARTICLE}?cid=50377368",
]
GOLDEN_PAGER = [f"{GOLDEN_ARTICLE}?page={p}" for p in (2, 3, 4, 5, 35)]


def fans_list(cid: str, n: int) -> str:
    """Deterministic data-fans payload with n fan ids (n-1 commas ⇒
    countOfFans == n, ZeitDe.hs:362-367)."""
    base = int(cid.rsplit("-", 1)[-1])
    return ",".join(str(7_000_000 + base * 37 + j) for j in range(n))


def comment_spans(
    off: int,
    cid: str,
    parent: str | None,
    parent_via: str | None,
    name: str,
    user: str | None,
    up_votes: int,
    article_url: str,
    body: str | None = None,
    date_no: int = 1,
) -> list[tuple]:
    """Spans of one ``<article class=comment>`` node in DOM order."""
    s = [text_span(ROLE_COMMENT, cid, off)]
    s.append(text_span(ROLE_BODY, body or f"  <p>body of {cid}</p> ", off + 1))
    if user is not None:
        # name inside an <a href=profile...> (ZeitDe.hs:139-147)
        s.append(media_span(ROLE_NAME, name, f"{USER_PREFIX}{user}", off + 2))
    else:
        # bare node, padded to exercise T.strip (ZeitDe.hs:146-147)
        s.append(text_span(ROLE_NAME, f"  {name} ", off + 2))
    s.append(
        media_span(
            ROLE_DATE,
            f"#{date_no} {EMDASH} vor {date_no} Tagen",
            f"{article_url}?cid={cid.rsplit('-', 1)[-1]}",
            off + 3,
        )
    )
    if parent is not None:
        if parent_via == "origin":  # ZeitDe.hs:153: fragmentOrUrl(href)
            s.append(
                media_span(ROLE_ORIGIN, "", f"{article_url}?x=1#{parent}", off + 4)
            )
        else:  # ZeitDe.hs:155-156: "cid-" <> input value
            s.append(
                text_span(ROLE_CID_INPUT, parent.rsplit("-", 1)[-1], off + 4)
            )
    s.append(text_span(ROLE_REACTION, fans_list(cid, up_votes), off + len(s)))
    # re-densify offsets (parent span optional)
    return [(k, t, m, off + i) for i, (k, t, m, _) in enumerate(s)]


def article_head_spans(
    canonical: str,
    title: str,
    description: str,
    author: str,
    date_iso: str,
    off: int = 0,
    charset: str | None = None,
) -> list[tuple]:
    s = []
    if charset:
        s.append(text_span(ROLE_CONTENT_TYPE, f"text/html; charset={charset}", 0))
    s += [
        media_span(ROLE_CANONICAL, "", canonical, 0),
        text_span(ROLE_TITLE, f"{title} | ZEIT ONLINE", 0),
        text_span(ROLE_DESCRIPTION, description, 0),
        text_span(ROLE_META_DATE, date_iso, 0),
        text_span(ROLE_BYLINE, author, 0),
    ]
    return [(k, t, m, off + i) for i, (k, t, m, _) in enumerate(s)]


def golden_page() -> tuple[str, list[tuple]]:
    """The zeit.de golden page as (url, spans)."""
    spans = article_head_spans(
        GOLDEN_ARTICLE,
        "Diskriminierung: Sagen Sie mal, Herr Meier, früher Frau Meier",
        "Trans im Beruf: Wie spricht man jemanden an, der das Geschlecht "
        "gewechselt hat?",
        "Juli Katz",
        "2019-10-29T10:02:14+01:00",
    )
    off = len(spans)
    for cid, parent, via, name, user, votes in GOLDEN_COMMENTS:
        cs = comment_spans(
            off, cid, parent, via, name, user, votes, GOLDEN_ARTICLE
        )
        spans += cs
        off += len(cs)
    for u in GOLDEN_JS_LOADER:
        # js-loader hrefs carry a fragment the collector must drop
        # (dropFragment, ZeitDe.hs:312-314)
        spans.append(media_span(ROLE_JS_LOADER, "", f"{u}#comments", off))
        off += 1
    # next button (ZeitDe.hs:320-323) — separate role, NOT a pager page
    spans.append(media_span(ROLE_NEXT, "Weiter", f"{GOLDEN_ARTICLE}?page=2", off))
    off += 1
    for u in GOLDEN_PAGER:
        spans.append(media_span(ROLE_PAGER, u.rsplit("=", 1)[-1], f"{u}#cid-top", off))
        off += 1
    return GOLDEN_URL, spans


# ---------------------------------------------------------------------------
# Multi-page fixture site (crawl-order tests)
# ---------------------------------------------------------------------------


def fixture_site() -> dict[str, list[tuple]]:
    """A deterministic little web under www.zeit.de whose FIFO and
    LIFO traces differ. Returns {url: spans}. Includes a search page,
    a profile page, a cross-domain page, dead links, and hygiene
    traps (#frag / mailto: / javascript:) reachable only via the
    generic all-links dispatcher."""
    site: dict[str, list[tuple]] = {}
    Z = "https://www.zeit.de"

    def art(slug: str) -> str:
        return f"{Z}/{slug}"

    def art_page(
        slug: str,
        page: int,
        n_pages: int,
        comments: list[tuple],
        js_cids: list[str],
        extra_links: list[str] = (),
        extra_js: list[str] = (),
    ) -> tuple[str, list[tuple]]:
        url = art(slug) if page == 1 else f"{art(slug)}?page={page}"
        canonical = art(slug)
        spans = article_head_spans(
            canonical,
            f"Artikel {slug}",
            f"desc {slug}",
            f"Autor {slug.title()}",
            "2020-01-09T14:15:58+01:00",
        )
        off = len(spans)
        for i, (cid, parent, via, name, user, votes) in enumerate(comments):
            cs = comment_spans(off, cid, parent, via, name, user, votes, canonical)
            spans += cs
            off += len(cs)
        for c in js_cids:
            spans.append(
                media_span(ROLE_JS_LOADER, "", f"{canonical}?cid={c}#top", off)
            )
            off += 1
        for href in extra_js:
            spans.append(media_span(ROLE_JS_LOADER, "", href, off))
            off += 1
        for p in range(2, n_pages + 1):
            if p != page:
                spans.append(
                    media_span(ROLE_PAGER, str(p), f"{canonical}?page={p}", off)
                )
                off += 1
        for href in extra_links:
            spans.append(media_span(ROLE_ANCHOR, "link", href, off))
            off += 1
        return url, spans

    def cmt(n: int, parent: int | None, via: str = "origin"):
        user = str(100000 + n) if n % 3 else None
        return (
            f"cid-{n}",
            f"cid-{parent}" if parent else None,
            via if parent else None,
            f"user{n}",
            user,
            (n % 5) + 1,
        )

    # article A: 3 pages, threaded comments, js-loaders on page 1
    u, s = art_page(
        "politik/2020-01/art-a",
        1,
        3,
        [cmt(11, None), cmt(12, 11), cmt(13, None, "cid")],
        ["14", "15"],
        extra_links=["/kultur/2020-02/art-b", "#top", "mailto:x@y.z"],
    )
    site[u] = s
    u, s = art_page(
        "politik/2020-01/art-a", 2, 3, [cmt(14, 11, "cid"), cmt(16, None)], [],
        extra_js=[art("kultur/2020-02/art-b"), "/suche/index?q=art"],
    )
    site[u] = s
    u, s = art_page(
        "politik/2020-01/art-a", 3, 3, [cmt(17, 16)], [],
        # relative js-loader target exercises mkAbsolute (App.hs:83) and
        # a dead link exercises the 404 path (App.hs:119-121)
        extra_js=["/serie/dead-link", "https://profile.zeit.de/100012"],
    )
    site[u] = s
    # cid permalink pages (from js-loaders)
    for c, parent in ((14, 11), (15, 13)):
        u, s = art_page(
            "politik/2020-01/art-a",
            1,
            1,
            [cmt(c, parent, "cid" if c == 14 else "origin")],
            [],
        )
        site[f"{art('politik/2020-01/art-a')}?cid={c}"] = s
    # article B: 2 pages, links back to A (discovered cross-article)
    u, s = art_page(
        "kultur/2020-02/art-b",
        1,
        2,
        [cmt(21, None), cmt(22, 21)],
        ["23"],
        extra_links=["/politik/2020-01/art-a", "javascript:void(0)"],
    )
    site[u] = s
    u, s = art_page("kultur/2020-02/art-b", 2, 2, [cmt(23, None), cmt(24, 23)], [])
    site[u] = s
    site[f"{art('kultur/2020-02/art-b')}?cid=23"] = art_page(
        "kultur/2020-02/art-b", 1, 1, [cmt(23, None)], []
    )[1]

    # search page: teasers to A and B + pager (ZeitDe.hs:103-110,217-242)
    su = f"{Z}/suche/index?q=art"
    spans = []
    off = 0
    for p in (2,):
        spans.append(media_span(ROLE_PAGER, str(p), f"{Z}/suche/index?q=art&p={p}", off))
        off += 1
    for slug, by in (("politik/2020-01/art-a", "Von  Alice Autor"),
                     ("kultur/2020-02/art-b", "Eine Kolumne von  Bob Byline")):
        spans += [
            media_span(ROLE_TEASER_LINK, "", art(slug), off),
            text_span(ROLE_TEASER_TITLE, f" Teaser {slug} ", off + 1),
            text_span(ROLE_TEASER_TEXT, f" teaser text {slug} ", off + 2),
            text_span(ROLE_TEASER_BYLINE, by, off + 3),
            text_span(ROLE_TEASER_DATETIME, "2020-01-09T14:15:58+01:00", off + 4),
        ]
        off += 5
    site[su] = [(k, t, m, i) for i, (k, t, m, _) in enumerate(spans)]
    site[f"{Z}/suche/index?q=art&p=2"] = [
        media_span(ROLE_TEASER_LINK, "", art("politik/2020-01/art-a"), 0)
    ]

    # profile page (profile.zeit.de): user-comment links, query-stripped
    # by the collector (ZeitDe.hs:340-347)
    pu = "https://profile.zeit.de/100012"
    site[pu] = [
        media_span(ROLE_USER_COMMENT, "", f"{art('politik/2020-01/art-a')}?cid=12#c", 0),
        media_span(ROLE_USER_COMMENT, "", f"{art('kultur/2020-02/art-b')}?cid=23", 1),
        media_span(ROLE_PAGER, "2", f"{pu}?p=2", 2),
    ]
    site[f"{pu}?p=2"] = [
        media_span(ROLE_USER_COMMENT, "", art("kultur/2020-02/art-b"), 0)
    ]

    # cross-domain page (only reachable with -x; gate C7)
    site["http://other.example.org/x"] = [
        media_span(ROLE_ANCHOR, "back", f"{art('politik/2020-01/art-a')}", 0)
    ]
    return site


def documents_df(
    spark: SparkSession, pages: dict[str, list[tuple]] | list[tuple[str, list[tuple]]]
) -> DataFrame:
    """Materialize {url: spans} as the documents table (status 200,
    utf-8 unless a meta-content-type span says otherwise)."""
    items = pages.items() if isinstance(pages, dict) else pages
    rows = [(url, [tuple(s) for s in spans], 200, None) for url, spans in items]
    return spark.createDataFrame(rows, DOCUMENTS)


# ---------------------------------------------------------------------------
# Distributed synthetic web (benchmark frontier; FIXTURES.md §7)
# ---------------------------------------------------------------------------


def synthetic_web(
    spark: SparkSession,
    n_docs: int,
    n_hosts: int = 1000,
    fanout: int = 8,
    n_comments: int = 3,
    zipf_skew: float = 3.0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_docs`` interleaved-span pages entirely with
    native column expressions over ``spark.range`` — no driver-side
    loop, so the same code generates 10^10 rows on a cluster.

    Host assignment is zipf-ish: u^skew concentrates mass on low
    host ids (hot-host skew for the salting/politeness machinery).
    Each page carries article head spans, ``n_comments`` comment
    nodes (threaded: comment j>0 parents comment 0) and ``fanout``
    js-loader links to hash-derived target docs on the same host
    plus one cross-host link.
    """
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    def h64(*cols) -> F.Column:
        return F.xxhash64(*cols, F.lit(seed))

    def host_of(doc: F.Column) -> F.Column:
        # zipf-ish host assignment: u^skew concentrates on low ids
        u = F.pmod(h64(doc), F.lit(1_000_000)) / 1_000_000.0
        return F.least(
            F.floor(F.pow(u, F.lit(zipf_skew)) * n_hosts).cast("long"),
            F.lit(n_hosts - 1),
        )

    def url_of(doc: F.Column) -> F.Column:
        return F.concat(
            F.lit("https://h"), host_of(doc).cast("string"), F.lit(".test/d/"),
            doc.cast("string"),
        )

    host_id = host_of(i)
    host = F.concat(F.lit("h"), host_id.cast("string"), F.lit(".test"))
    df = df.withColumn("host_id", host_id).withColumn("doc_id", url_of(i))

    def target_url(j: F.Column) -> F.Column:
        # deterministic hash walk to a real document (the target's own
        # host — a link must resolve to an existing page)
        t = F.pmod(h64(i, j), F.lit(n_docs))
        return url_of(t)

    cid = F.concat(F.lit("cid-"), i.cast("string"), F.lit("-"))

    head = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(f"{ROLE_CANONICAL}\x1f").alias("text"),
            F.col("doc_id").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit(f"{ROLE_TITLE}\x1f"), F.lit("Doc "), i.cast("string"),
                     F.lit(" | SYNTH")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(1).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit(f"{ROLE_META_DATE}\x1f2020-01-0"),
                     (F.pmod(i, F.lit(9)) + 1).cast("string"),
                     F.lit("T12:00:00+01:00")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(2).alias("offset"),
        ),
    )
    comments = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_comments - 1)),
            lambda j: F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.concat(F.lit(f"{ROLE_COMMENT}\x1f"), cid, j.cast("string")
                             ).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
                F.struct(
                    F.lit("text").alias("kind"),
                    F.concat(F.lit(f"{ROLE_BODY}\x1fsynthetic comment body "),
                             cid, j.cast("string")).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
                F.struct(
                    F.lit("media").alias("kind"),
                    F.concat(F.lit(f"{ROLE_NAME}\x1fuser-"),
                             F.pmod(h64(i, j), F.lit(10_000)).cast("string")
                             ).alias("text"),
                    F.concat(F.lit(USER_PREFIX),
                             F.pmod(h64(i, j), F.lit(10_000)).cast("string")
                             ).alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
                F.struct(
                    F.lit("text").alias("kind"),
                    F.concat(
                        F.lit(f"{ROLE_REACTION}\x1f"),
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.sequence(F.lit(0), F.pmod(h64(i, j), F.lit(4))),
                                lambda k: F.pmod(h64(i, j, k), F.lit(100_000))
                                .cast("string"),
                            ),
                        ),
                    ).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
                # parent pointer: comments j>0 reply to comment 0
                # (cid-input path, ZeitDe.hs:155-156); j==0 emits a
                # null-text placeholder filtered out below.
                F.struct(
                    F.lit("text").alias("kind"),
                    F.when(
                        j > 0,
                        F.concat(F.lit(f"{ROLE_CID_INPUT}\x1f"),
                                 i.cast("string"), F.lit("-0")),
                    ).alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                ),
            ),
        )
    )
    comments = F.filter(comments, lambda s: s["text"].isNotNull())
    links = F.transform(
        F.sequence(F.lit(0), F.lit(fanout - 1)),
        lambda j: F.struct(
            F.lit("media").alias("kind"),
            F.lit(f"{ROLE_JS_LOADER}\x1f").alias("text"),
            target_url(j).alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
    )
    cross = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(f"{ROLE_PAGER}\x1f2").alias("text"),
            url_of(F.pmod(h64(i, F.lit(778)), F.lit(n_docs))).alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    spans = F.concat(head, comments, links, cross)
    # densify offsets (the per-row order key)
    spans = F.transform(
        spans,
        lambda s, idx: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            idx.cast("int").alias("offset"),
        ),
    )
    return df.select(
        F.col("doc_id"),
        spans.alias("spans"),
        F.lit(200).alias("status"),
        F.lit(None).cast("string").alias("encoding"),
    )
