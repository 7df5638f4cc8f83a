"""Pure-Python simulator of the reference's crawl loop — the test
oracle for crawl ordering and the seen set.

Implements, line-for-line, the semantics of
/root/reference/src/Network/Scrapetition/App.hs:38-108 over span
pages (the fixture site), with exact ``Data.List`` behavior:

- ``union xs ys = xs ++ foldl (flip delete) (nub ys) xs`` — left
  operand verbatim, right nub'd minus left's elements, appended;
- ``xs \\\\ ys`` — delete the first occurrence of each y;
- ``nub`` — first-occurrence dedup;
- ``nextUrl`` — first worklist element not in seen (App.hs:99-108).

This is deliberately row-at-a-time Python: it is the *oracle*, not
the engine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from scrapetition_spark import spans as SP
from scrapetition_spark.config import CrawlConfig, Dispatcher
from scrapetition_spark.functions.urls import domain_str, mk_absolute_str


def nub(xs: list) -> list:
    seen, out = set(), []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def union(xs: list, ys: list) -> list:
    # Data.List.union
    out = list(xs)
    right = nub(ys)
    for x in xs:
        if x in right:
            right.remove(x)
    return out + right


def difference(xs: list, ys: list) -> list:
    # Data.List.(\\): removes the FIRST occurrence of each y
    out = list(xs)
    for y in ys:
        if y in out:
            out.remove(y)
    return out


def _role_payload(text: str) -> tuple[str, str]:
    i = text.find(SP.SEP)
    return (text, "") if i < 0 else (text[:i], text[i + 1 :])


def _drop_fragment(u: str) -> str:
    return u.split("#", 1)[0]


def _strip_query(u: str) -> str:
    return u.split("?", 1)[0]


def collect_urls(spans: list[tuple], dispatcher: Dispatcher) -> list[str]:
    """Per-dispatcher URL scraper over spans (collector-concat order,
    document order within a collector)."""
    by_role: dict[str, list[str]] = {}
    for kind, text, media_ref, offset in sorted(spans, key=lambda s: s[3]):
        role, _ = _role_payload(text)
        if media_ref is None:
            continue
        if role == SP.ROLE_JS_LOADER or role == SP.ROLE_PAGER:
            by_role.setdefault(role, []).append(_drop_fragment(media_ref))
        elif role == SP.ROLE_NEXT:
            by_role.setdefault(role, []).append(media_ref)
        elif role == SP.ROLE_USER_COMMENT:
            by_role.setdefault(role, []).append(_strip_query(media_ref))
        elif role == SP.ROLE_TEASER_LINK:
            by_role.setdefault(role, []).append(media_ref)
        elif role == SP.ROLE_ANCHOR:
            if not (
                media_ref.startswith("#")
                or media_ref.startswith("mailto:")
                or media_ref.startswith("javascript:")
            ):
                by_role.setdefault(role, []).append(_drop_fragment(media_ref))
    out: list[str] = []
    for role in dispatcher.url_collectors:
        out += by_role.get(role, [])
    return out


def extract_comments(spans: list[tuple]) -> list[dict]:
    """Minimal comment extraction (id/parent/user/fans) for sink
    assertions."""
    comments: list[dict] = []
    cur: dict | None = None
    for kind, text, media_ref, offset in sorted(spans, key=lambda s: s[3]):
        role, payload = _role_payload(text)
        if role == SP.ROLE_COMMENT:
            cur = {"id": payload, "parent": None, "user": None, "fans": None}
            comments.append(cur)
        elif cur is None:
            continue
        elif role == SP.ROLE_ORIGIN and media_ref is not None:
            cur["parent"] = media_ref.split("#")[-1] if "#" in media_ref else media_ref
        elif role == SP.ROLE_CID_INPUT:
            cur["parent"] = "cid-" + payload
        elif role == SP.ROLE_NAME and media_ref is not None:
            if media_ref.startswith(SP.USER_PREFIX):
                cur["user"] = media_ref[len(SP.USER_PREFIX):]
        elif role == SP.ROLE_REACTION:
            cur["fans"] = payload
    return comments


@dataclass
class SimResult:
    trace: list[str] = field(default_factory=list)  # fetch order
    seen: list[str] = field(default_factory=list)
    inserted_urls: list[str] = field(default_factory=list)  # S6, insertion order
    edges: list[tuple[str, str]] = field(default_factory=list)  # S7, deduped
    comments: list[dict] = field(default_factory=list)


def simulate(
    site: dict[str, list[tuple]],
    seeds: list[str],
    cfg: CrawlConfig,
    max_steps: int = 10_000,
) -> SimResult:
    res = SimResult()
    urls = list(seeds)
    seen: list[str] = []
    inserted = nub(list(seeds))  # crawl -u inserts the seed (Main.hs:245)
    edges: list[tuple[str, str]] = []
    dispatchers = cfg.dispatchers

    steps = 0
    while steps < max_steps:
        steps += 1
        nxt = next((u for u in urls if u not in seen), None)
        if nxt is None:
            break
        res.trace.append(nxt)
        spans = site.get(nxt)  # None ⇒ 404, no body (App.hs:119-121)
        new_per_dispatcher: list[list[str]] = []
        for d in dispatchers:
            if not re.search(d.url_scheme, nxt):
                continue
            d_urls_raw = collect_urls(spans, d) if spans is not None else []
            d_urls = nub([mk_absolute_str(nxt, u) for u in d_urls_raw])
            # insertUrls + insertScrapedUrls (App.hs:89-90), gate-free
            for u in d_urls:
                if u not in inserted:
                    inserted.append(u)
                e = (nxt, u)
                if e not in edges:
                    edges.append(e)
            if spans is not None and d.item_kind == "comment":
                res.comments += [
                    c for c in extract_comments(spans)
                    if c["id"] not in {x["id"] for x in res.comments}
                ]
            new_per_dispatcher.append(d_urls)
        new = [
            mk_absolute_str(nxt, u)
            for lst in new_per_dispatcher
            for u in lst
        ] if cfg.follow_links else []
        new = nub(new)
        if not cfg.cross_domain:
            new = [u for u in new if domain_str(u) == cfg.start_domain]
        seen = [nxt] + seen  # seen' = next:seen
        worklist = union(new, urls) if cfg.lifo else union(urls, new)
        urls = difference(worklist, seen)
    res.seen = seen
    res.inserted_urls = inserted
    res.edges = edges
    return res
