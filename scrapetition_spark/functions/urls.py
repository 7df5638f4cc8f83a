"""URL scalar functions (SURVEY.md §2.3 U1-U7).

Reference semantics (all /root/reference/src/Network/Scrapetition/):
- U1 ``domain``       Utils.hs:26-31  — host of an *absolute* URI;
  null for scheme-less strings and URIs without an authority
  (``urn:``, ``mailto:``). Golden: test/.../Utils.hs:149-153.
- U2 ``mkAbsolute``   Utils.hs:36-42  — RFC 3986 resolution of a
  relative reference against a base; an absolute reference passes
  through; unparsable base ⇒ the path is returned verbatim.
  Golden: test/.../Utils.hs:156-161.
- U3 ``identifier``   Utils.hs:49-67  — ``domain <> sep <> id`` with
  overrides; literal fallback ``"unkown"`` (reference's misspelling).
- U4 ``fragmentOrUrl``  Scrapers/ZeitDe.hs:374-379
- U5 ``dropFragment``   Scrapers/ZeitDe.hs:382-383
- U6 query-strip        Scrapers/ZeitDe.hs:165-167 (takeWhile /= '?')
- U7 link hygiene       Scrapers/Generic.hs:45-52

Vectorization: U1 is a pure-regex pandas UDF (no per-row urlparse in
the hot path). U2 short-circuits already-absolute refs via a regex
mask and only calls ``urljoin`` on the (rare) relative remainder —
at crawl scale almost every URL entering canonicalization is already
absolute, so the Python-level loop touches a tiny minority of rows.
U3-U7 are native Column expressions (JVM, whole-stage codegen).
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# RFC 3986 scheme: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) ":"
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"
# scheme '://' userinfo@ host :port — capture the host (reg-name).
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/?#:@]*)"


def domain_str(url: str | None) -> str | None:
    """Pure-Python U1 (single value) — same regex as the vectorized
    kernel; used by the test-oracle simulator."""
    import re

    if url is None:
        return None
    m = re.match(_HOST_RE, url)
    if not m or not m.group(1):
        return None
    return m.group(1).lower()


def mk_absolute_str(base: str | None, path: str | None) -> str | None:
    """Pure-Python U2 (single value), same branch logic as the kernel."""
    import re

    if path is None:
        return None
    if re.match(_SCHEME_RE, path):
        return path
    if base is None or not re.match(_SCHEME_RE, base):
        return path
    try:
        return urljoin(base, path)
    except ValueError:
        return path


def _domain_series(urls: pd.Series) -> pd.Series:
    """Vectorized U1: host of an absolute URI, else <NA>.

    Mirrors parseURI >>= uriAuthority >>= uriRegName (Utils.hs:26-31):
    scheme required; empty authority (urn:, mailto:) ⇒ null.
    """
    host = urls.str.extract(_HOST_RE, expand=False)
    host = host.mask(host.notna() & (host.str.len() == 0)).str.lower()
    return host.astype("object").where(host.notna(), None)


@pandas_udf(StringType())
def url_domain_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return _domain_series(urls)


def url_domain(col: Column | str) -> Column:
    """U1 as a NATIVE expression (JVM regex, whole-stage codegen) —
    the exact twin of the pandas kernel above (same ``_HOST_RE``,
    same empty-authority ⇒ null rule; property-tested equal in
    tests/test_urls.py). U1 sits on every hot path of the epoch loop
    (host columns, host buckets, metrics, cross-domain gate), so it
    must not spin Python workers; the pandas kernel remains as the
    cross-checked reference implementation."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    return F.when(h != "", h)


def domain_of(col: Column | str) -> Column:
    """U1 as a Column expression."""
    return url_domain(col)


def _mk_absolute_series(bases: pd.Series, paths: pd.Series) -> pd.Series:
    """Vectorized U2 (Utils.hs:36-42).

    - path with a scheme (absolute URI) ⇒ parseRelativeReference
      fails in the reference ⇒ path verbatim (which equals RFC
      resolution for absolute refs, so passthrough is exact);
    - base without a scheme ⇒ parseURI fails ⇒ path verbatim;
    - otherwise RFC 3986 resolution (urljoin).
    """
    path_absolute = paths.str.match(_SCHEME_RE).astype("boolean").fillna(False)
    base_ok = bases.str.match(_SCHEME_RE).astype("boolean").fillna(False)
    out = paths.copy()
    todo = (~path_absolute) & base_ok & paths.notna()
    if todo.any():

        def _join(row: tuple[str, str]) -> str:
            try:
                return urljoin(row[0], row[1])
            except ValueError:
                return row[1]

        sub = pd.DataFrame({"b": bases[todo], "p": paths[todo]})
        out[todo] = [_join(t) for t in zip(sub["b"], sub["p"])]
    return out


@pandas_udf(StringType())
def url_join(bases: pd.Series, paths: pd.Series) -> pd.Series:  # pragma: no cover
    return _mk_absolute_series(bases, paths)


def url_resolve_native(base: Column, target: Column) -> Column:
    """U2 fast path: RFC 3986 resolution as a native Column expression
    for the cases that dominate crawling — absolute refs,
    protocol-relative (``//h/p``), root-relative (``/p``),
    fragment-only, query-only, and plain relative refs without dot
    segments. Returns NULL when the case needs the Python fallback
    (dot segments, empty refs, non-hierarchical bases), so callers can
    route just those rows through the vectorized ``url_join`` UDF.
    Native coverage is usable inside array lambdas (higher-order
    functions), which keeps per-page URL discovery entirely map-side.
    Equality with ``mk_absolute_str`` on the covered domain is
    property-tested (tests/test_urls.py)."""
    origin = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    base_nf = F.substring_index(base, "#", 1)
    base_nq = F.substring_index(base_nf, "?", 1)
    base_dir = F.regexp_extract(base_nq, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^?#]*/)", 1)
    t = target
    return (
        F.when(t.isNull() | (t == "") | t.rlike(r"(^|/)\.\.?(/|$)"), F.lit(None))
        .when(t.rlike(_SCHEME_RE), t)  # absolute ⇒ passthrough (exact)
        .when(~base.rlike(_SCHEME_RE), t)  # unparsable base ⇒ verbatim
        .when(t.startswith("//") & (origin != ""), F.concat(scheme, F.lit(":"), t))
        .when(t.startswith("/") & (origin != ""), F.concat(origin, t))
        .when(t.startswith("/"), F.lit(None))  # no authority ⇒ fallback
        .when(t.startswith("#") & (origin != ""), F.concat(base_nf, t))
        .when(t.startswith("?") & (origin != ""), F.concat(base_nq, t))
        .when(base_dir != "", F.concat(base_dir, t))
        .when(origin != "", F.concat(origin, F.lit("/"), t))
        .otherwise(F.lit(None))
    )


def mk_absolute(base: Column | str, path: Column | str) -> Column:
    """U2 as a Column expression: resolve ``path`` against ``base``."""
    b = F.col(base) if isinstance(base, str) else base
    p = F.col(path) if isinstance(path, str) else path
    return url_join(b, p)


def identifier(
    sep: str,
    url: Column | None,
    item_id: Column,
    domain_override: Column | None = None,
    other_id: Column | None = None,
) -> Column:
    """U3 (Utils.hs:49-67): ``coalesce(override, domain(url), 'unkown')
    || sep || coalesce(other, id)``.  The ``unkown`` literal is the
    reference's own misspelling (golden test/.../Utils.hs:137-146).
    """
    dom_parts = []
    if domain_override is not None:
        dom_parts.append(domain_override)
    if url is not None:
        dom_parts.append(url_domain(url))
    dom_parts.append(F.lit("unkown"))
    dom = F.coalesce(*dom_parts)
    the_id = item_id if other_id is None else F.coalesce(other_id, item_id)
    return F.concat(dom, F.lit(sep), the_id)


def fragment_or_url(col: Column | str) -> Column:
    """U4 (ZeitDe.hs:374-379): the last '#'-fragment if any, else the
    whole string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.contains("#"), F.element_at(F.split(c, "#"), -1)).otherwise(c)


def drop_fragment(col: Column | str) -> Column:
    """U5 (ZeitDe.hs:382-383): takeWhile (/= '#')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "#", 1)


def strip_query(col: Column | str) -> Column:
    """U6 (ZeitDe.hs:165-167): takeWhile (/= '?')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "?", 1)


def hygienic_link(col: Column | str) -> Column:
    """U7 (Generic.hs:45-52): keep a link unless it starts with '#',
    'mailto:' or 'javascript:'."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        ~c.startswith("#") & ~c.startswith("mailto:") & ~c.startswith("javascript:")
    )


def count_of_fans(col: Column | str) -> Column:
    """P9 (ZeitDe.hs:362-367): up-votes = comma count + 1 over the
    raw ``data-fans`` attribute."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, ","))


def host_bucket(host: Column | str, n_buckets: int, salt: Column | None = None) -> Column:
    """Salted host-hash bucket for frontier partitioning (north rule:
    'per-host-hash salted partitions ... salted repartitioning to
    defuse hot-host skew'). ``salt`` spreads one hot host over several
    buckets while keeping same-host rows co-bucketed per salt value."""
    h = F.col(host) if isinstance(host, str) else host
    key = h if salt is None else F.concat_ws("\x1f", h, salt.cast("string"))
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")
