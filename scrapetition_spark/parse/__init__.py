"""Vectorized span→item parse plan (SURVEY.md §2.4)."""

from scrapetition_spark.parse.kernel import ParseResult, explode_spans, parse_pages  # noqa: F401
