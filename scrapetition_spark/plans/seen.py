"""Partitioned bloom seen-filter (north rule; SURVEY.md §4.1).

The reference keeps the seen set as an in-memory Haskell list probed
with ``elem`` (O(n) per probe, O(n²) per crawl —
/root/reference/src/Network/Scrapetition/App.hs:69,107). At 10^10
URLs that is impossible; the scalable design is:

1. an append-only ``urls_seen`` table (exact truth, partitioned by
   host bucket on a real deployment);
2. a bloom sidecar built *distributed*: each partition folds its
   ``xxhash64(url)`` values into a local bitset inside a vectorized
   Arrow kernel (``mapInPandas``), the per-partition bitsets are
   OR-merged, and the merged filter is broadcast for the next epoch;
3. probes are vectorized bit-tests; bloom *negatives* are definitely
   unseen (no join needed — the common case for a growing crawl),
   bloom *positives* are verified exactly with a ``left_anti`` join
   against ``urls_seen`` so false positives can never drop a URL
   (SURVEY.md §7.3 exactness requirement).

All hashing is JVM-side ``xxhash64``; Python only does numpy bit
math on int64 arrays (no per-row Python). K hash functions derive
from the one 64-bit hash by double hashing (Kirsch-Mitzenmacher).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

_HASH_COL = "__h64"


def _plan_params(expected_keys: int, bits_per_key: int) -> tuple[int, int]:
    m_bits = max(1 << 10, 1 << math.ceil(math.log2(max(1, expected_keys) * bits_per_key)))
    k = max(1, round(0.693 * m_bits / max(1, expected_keys)))
    return m_bits, min(k, 16)


def _positions(h64: np.ndarray, m_bits: int, k: int) -> Iterator[np.ndarray]:
    """k bit positions per hash via double hashing on the uint64."""
    h = h64.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd ⇒ full-period step
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


class BloomFilter:
    """Immutable bloom over xxhash64(url) values."""

    def __init__(self, bits: np.ndarray, m_bits: int, k: int, n_keys: int = 0):
        self.bits = bits  # uint8 array of m_bits/8 bytes
        self.m_bits = m_bits
        self.k = k
        self.n_keys = n_keys

    @classmethod
    def empty(cls, expected_keys: int, bits_per_key: int = 16) -> "BloomFilter":
        m_bits, k = _plan_params(expected_keys, bits_per_key)
        return cls(np.zeros(m_bits // 8, dtype=np.uint8), m_bits, k)

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m_bits == other.m_bits and self.k == other.k
        return BloomFilter(
            np.bitwise_or(self.bits, other.bits),
            self.m_bits,
            self.k,
            self.n_keys + other.n_keys,
        )

    # ---- distributed build -------------------------------------------------

    def build_from(self, df: DataFrame, url_col: str = "url") -> "BloomFilter":
        """Fold df[url_col] into a new filter. Per-partition bitsets
        are built in an Arrow kernel and OR-merged on the driver
        (bitset size is the broadcast budget: m/8 bytes)."""
        m_bits, k = self.m_bits, self.k
        # constant fold-fanout: one bitset per fold partition crosses
        # the driver regardless of cluster width (at 32+ cores the
        # per-partition bitsets would otherwise dominate epoch cost)
        hashed = df.select(F.xxhash64(F.col(url_col)).alias(_HASH_COL)).coalesce(8)
        out_schema = StructType([StructField("bits", BinaryType())])

        def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local = np.zeros(m_bits // 8, dtype=np.uint8)
            any_rows = False
            for b in batches:
                if len(b) == 0:
                    continue
                any_rows = True
                h = b[_HASH_COL].to_numpy(dtype=np.int64)
                for pos in _positions(h, m_bits, k):
                    np.bitwise_or.at(local, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            if any_rows:
                yield pd.DataFrame({"bits": [local.tobytes()]})

        parts = hashed.mapInPandas(fold, out_schema).collect()
        merged = self.bits.copy()
        n = 0
        for row in parts:
            merged |= np.frombuffer(row["bits"], dtype=np.uint8)
            n += 1
        return BloomFilter(merged, m_bits, k, self.n_keys)

    # ---- vectorized probe ---------------------------------------------------

    def contains(self, h64: np.ndarray) -> np.ndarray:
        """Boolean mask: True = maybe seen, False = definitely unseen."""
        mask = np.ones(len(h64), dtype=bool)
        for pos in _positions(h64, self.m_bits, self.k):
            byte = self.bits[pos >> 3]
            mask &= (byte & (1 << (pos & 7)).astype(np.uint8)) != 0
        return mask

    def probe_column(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """Add boolean column ``__maybe_seen`` via a broadcast
        vectorized probe."""
        bits_b = df.sparkSession.sparkContext.broadcast(self.bits.tobytes())
        m_bits, k = self.m_bits, self.k
        hashed = df.withColumn(_HASH_COL, F.xxhash64(F.col(url_col)))
        out_schema = StructType(df.schema.fields)

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bits = np.frombuffer(bits_b.value, dtype=np.uint8)
            bf = BloomFilter(bits, m_bits, k)
            for b in batches:
                if len(b) == 0:
                    continue
                h = b[_HASH_COL].to_numpy(dtype=np.int64)
                b = b.drop(columns=[_HASH_COL])
                b["__maybe_seen"] = bf.contains(h)
                yield b

        from pyspark.sql.types import BooleanType

        out = StructType(out_schema.fields + [StructField("__maybe_seen", BooleanType())])
        return hashed.mapInPandas(probe, out)


def unseen(
    candidates: DataFrame,
    seen_table: DataFrame,
    bloom: BloomFilter | None,
    url_col: str = "url",
) -> DataFrame:
    """Exact not-seen set (C1/C5 ``\\\\ seen``): bloom prefilter +
    exact anti-join on the bloom-positive residue. With no bloom,
    plain ``left_anti`` (small-scale path)."""
    if bloom is None or bloom.n_keys == 0:
        return candidates.join(seen_table.select(url_col), [url_col], "left_anti")
    probed = bloom.probe_column(candidates, url_col)
    definite_new = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    verified_new = maybe.join(seen_table.select(url_col), [url_col], "left_anti")
    return definite_new.unionByName(verified_new)
