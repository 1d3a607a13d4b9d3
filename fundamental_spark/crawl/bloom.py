"""Partitioned bloom filter over the URL-seen set.

The reference holds the seen set as an in-memory Python set plus a
SQLite-backed set (funda_spider.py:35,46; database.py:37-51) — fine for
~10^5 URLs, impossible at the 10^10-URL frontier the north rule sizes
for. Design here:

- the seen set is sharded by ``domain_shard = pmod(xxhash64(url), N)``
  (salting the one-host crawl, SURVEY.md §2.8 T7);
- per shard we build a compact bloom bitmap with ``applyInPandas``
  (numpy-vectorized double hashing over the 64-bit url_hash — no
  per-row Python), sized for a target false-positive rate;
- probing joins candidates to the (small) bloom table on domain_shard
  and checks membership vectorized;
- bloom is a **prefilter only**: probe-positive candidates go through
  an exact anti-join (exact-set semantics, funda_spider.py:119-120 — a
  bloom alone would drop real listings on false positives), while
  probe-negative candidates are *definitely new* and skip the shuffle
  entirely. At 10^10 URLs with ~1% FP, the exact anti-join touches ~1%
  of candidates instead of all of them.

Per-shard bitmaps stay O(seen/shards · bits_per_key / 8) bytes; the
probe ships them once per executor as a Spark broadcast variable (the
whole filter must fit executor memory — ~1.25 GB at 10^9 keys and 10
bits/key). At the 10^10-key extreme (~12.5 GB total) the path is
co-partitioning: shuffle candidates on domain_shard and read each
shard's bitmap only in its own task — never per-row duplication (see
probe_bloom's docstring for the measured cost of getting this wrong).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "domain_shard int, m long, k int, bitmap binary"


def _plan(n_keys: int, fpp: float) -> tuple[int, int]:
    """Standard bloom sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2."""
    n = max(n_keys, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 16)


def _positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """k positions per key via double hashing of the 64-bit url_hash.
    splitmix64-style mixing keeps the two base hashes independent."""
    x = h.astype(np.uint64)
    z = (x + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h1 = z ^ (z >> np.uint64(31))
    z2 = (x ^ np.uint64(0xC2B2AE3D27D4EB4F)) * np.uint64(0x165667B19E3779F9)
    h2 = (z2 ^ (z2 >> np.uint64(29))) | np.uint64(1)
    ks = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) % np.uint64(m)).astype(np.int64)


def build_bloom(seen: DataFrame, n_keys_per_shard: int, fpp: float = 0.01) -> DataFrame:
    """seen(url_hash, domain_shard) -> one bloom row per shard."""
    m, k = _plan(n_keys_per_shard, fpp)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        if len(pdf):
            pos = _positions(pdf["url_hash"].to_numpy(), m, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "domain_shard": [int(pdf["domain_shard"].iloc[0]) if len(pdf) else -1],
                "m": [m],
                "k": [k],
                "bitmap": [bits.tobytes()],
            }
        )

    return (
        seen.select("url_hash", "domain_shard")
        .groupBy("domain_shard")
        .applyInPandas(_build, schema=BLOOM_SCHEMA)
    )


def probe_bloom(candidates: DataFrame, bloom: DataFrame) -> DataFrame:
    """candidates(url_hash, domain_shard, ...) + bloom table ->
    candidates with a ``maybe_seen`` boolean. maybe_seen=False is
    definitive (no false negatives).

    The per-shard bitmaps ride a Spark BROADCAST VARIABLE read inside
    the UDF (bounded collect: n_shards rows), so candidates are never
    shuffled and no bitmap byte is ever serialized per candidate row.
    The earlier broadcast-JOIN design was quietly quadratic in traffic:
    the join column carrying the shard's bitmap was materialized into
    EVERY candidate row of the Arrow batches feeding the UDF — ~75 KB
    duplicated per row at bench sizing, 5x the probe's real work
    (measured 54 s -> ~2 s for a 200k-row probe of a 2M-key filter).
    Total filter bytes must fit DRIVER memory (the bounded collect
    below) and executor memory — the executor bound is the same one
    the join design already imposed; past that (10^10-key frontiers),
    the scale path is co-partitioning candidates and filter on
    domain_shard (one shuffle of the candidates, each task reading
    only its shard's bitmap). Broadcast lifecycle: one broadcast per
    probe call, freed by Spark's ContextCleaner once the caller
    releases the returned DataFrame — a wave-loop caller that drops
    its frames per wave (the runner does) keeps O(1) broadcasts
    live."""
    sc = candidates.sparkSession.sparkContext
    tables = {
        int(r["domain_shard"]): (int(r["m"]), int(r["k"]), bytes(r["bitmap"]))
        for r in bloom.collect()
    }
    bc = sc.broadcast(tables)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _member(url_hash: pd.Series, shard: pd.Series) -> pd.Series:
        out = np.zeros(len(url_hash), dtype=bool)
        if len(url_hash) == 0:
            return pd.Series(out)
        arr_h = url_hash.to_numpy()
        sh = shard.to_numpy()
        for s in np.unique(sh):
            ent = bc.value.get(int(s))
            i = np.nonzero(sh == s)[0]
            if ent is None:
                continue  # no bloom for shard -> nothing seen there
            mm, kk, b = ent
            bits = np.frombuffer(b, dtype=np.uint8)
            pos = _positions(arr_h[i], mm, kk)
            hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            out[i] = hit.all(axis=0)
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", _member("url_hash", "domain_shard"))
