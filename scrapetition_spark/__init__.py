"""scrapetition_spark — a PySpark-native crawl + analytics engine.

A from-scratch reimplementation of the *capabilities* of
lueck/scrapetition (reference at /root/reference, Haskell) as an
idiomatic Spark engine: a URL-frontier + fetch-scheduler crawl loop
over snapshot-versioned tables, vectorized span parsing, dedup sinks,
thread propagation, and the downstream analytics query surface —
plus the large-scale training-data operators (dedup, similarity
search, text analysis) a 100 TB corpus pipeline needs.

Design notes (SURVEY.md §1.4, §4.3):
- All tables are explicit StructType schemas (`schemas.py`).
- The per-URL recursion of the reference (App.hs:38-69) becomes a
  per-epoch set of distributed jobs (`crawl.py`).
- Per-row logic is vectorized pandas/Arrow UDFs or native column
  expressions only — no row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"
