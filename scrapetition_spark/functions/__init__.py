"""Scalar function layer: URL functions, text analysis, hashing.

Everything here is either a native Column expression (JVM-side,
whole-stage codegen) or an Arrow-vectorized pandas UDF — no
row-at-a-time Python UDFs (north rule / SURVEY.md §2.6).
"""

from scrapetition_spark.functions.urls import (  # noqa: F401
    count_of_fans,
    domain_of,
    drop_fragment,
    fragment_or_url,
    host_bucket,
    identifier,
    mk_absolute,
    strip_query,
    url_domain,
    url_join,
)
